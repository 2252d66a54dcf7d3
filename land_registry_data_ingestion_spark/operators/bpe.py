"""Corpus-scale BPE tokenizer training (Sennrich et al. 2016).

The classic formulation trains on the WORD-TYPE frequency table, not the
raw corpus — which is exactly what makes it distributable: one corpus
pass builds (word, freq) (shuffle ∝ token count, map-side combined), and
every merge round after that is proportional to the number of word
TYPES, a set that grows sub-linearly with corpus size (Heaps' law).

Per round: adjacent symbol pairs explode out of the symbol arrays and
feed a freq-weighted codegen'd hash aggregate; the argmax pair (count
desc, pair lexicographic — the deterministic tiebreak) is a TakeOrdered
of ONE row to the driver; applying the merge is the genuinely
sequential-per-word step (greedy left-to-right, overlap-aware), done in
one Arrow batch pass over the word table. n_merges rounds = n_merges
small jobs over a frame that never grows.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from land_registry_data_ingestion_spark.functions.text import (
    normalize_text,
    tokens,
)

END_OF_WORD = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the normalized token stream — the one pass that
    touches the corpus."""
    return (
        df.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_pair_in(symbols: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right merge of adjacent (a, b) — 'aaa' under (a,a)
    becomes (aa, a), matching the reference implementation."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns the
    ordered merge list (may be shorter if no pair reaches
    ``min_pair_freq``). Deterministic: ties break lexicographically on
    the pair."""
    words = word_frequencies(df, text_col=text_col)
    syms = words.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
    )
    # The word-type table is re-read every round; materialize it once.
    # small=True: the table is vocabulary-sized (word TYPES, Heaps-law
    # sublinear in the corpus), so it lives in memory across the merge
    # loop instead of paying a disk round-trip per round.
    from land_registry_data_ingestion_spark.util import barrier

    current = barrier(syms, small=True)
    current.count()  # persist is lazy; force each round's input
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = current.where(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
            .where(F.col("c") >= min_pair_freq)
            .orderBy(F.col("c").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        prev = current
        # localCheckpoint, not barrier: a persist leaves round k's
        # logical plan k selects deep, and Catalyst re-analyzes the full
        # tree on every action — measured as a driver-heap OOM at only
        # ~60 merge rounds (2k docs, default heap). The eager checkpoint
        # cuts each round's plan to a LogicalRDD of the materialized
        # word-type table, so round cost is flat in the round number all
        # the way to realistic (tens-of-thousands) merge counts; storage
        # stays memory-first like small=True, and the superseded round's
        # blocks are reclaimed by the ContextCleaner once unreferenced.
        current = current.select(
            "freq", _merge_udf(a, b)("syms").alias("syms")
        ).localCheckpoint(eager=True)
        # round 0's input is the one plain persist — release it once the
        # first checkpoint supersedes it (no-op for checkpointed frames)
        prev.unpersist(blocking=False)
    return merges


def _merge_udf(a: str, b: str):
    """Per-round Arrow kernel; a factory so the rule binds NOW, not when
    the lazy plan finally executes rounds later."""

    @F.pandas_udf(ArrayType(StringType()))
    def apply_merge(col: pd.Series) -> pd.Series:
        return col.map(lambda s: _merge_pair_in(list(s), a, b))

    return apply_merge


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist the learned merge table (rank order = line order) — the
    tokenizer artifact a training pipeline ships alongside the corpus.
    Plain JSON-lines, no engine types, so any consumer can load it."""
    import json

    with open(path, "w") as fh:
        for a, b in merges:
            fh.write(json.dumps([a, b]) + "\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    import json

    out: list[tuple[str, str]] = []
    with open(path) as fh:
        for line in fh:
            if line.strip():
                a, b = json.loads(line)
                out.append((a, b))
    return out


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned merges to every document: one Arrow pass, merges
    broadcast in rank order (earlier rules bind tighter, as in training).
    Output is the per-doc subword array incl. </w> markers."""
    rules = list(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def encode(col: pd.Series) -> pd.Series:
        def enc(text: str) -> list[str]:
            out: list[str] = []
            for word in text.split():
                s = list(word) + [END_OF_WORD]
                for a, b in rules:
                    if len(s) < 2:
                        break
                    s = _merge_pair_in(s, a, b)
                out.extend(s)
            return out

        return col.map(enc)

    norm = normalize_text(F.col(text_col))
    return df.withColumn(out_col, encode(norm))
