"""Randomized differential test: duplicated_spans vs a naive in-memory
oracle (independent implementation — dict-of-grams, set-cover merge).
Every corpus also carries a NULL-text and an empty-text document: NULL
must behave as the empty document ('' / 0 kept tokens, no spans) — the
round-7 regression class."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from land_registry_data_ingestion_spark.operators.spans import duplicated_spans

K = 5


def _naive_spans(texts: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    """(doc_id, span_start, span_end) by direct enumeration: count every
    k-gram, mark covered token positions, emit maximal covered runs —
    adjacency (gap == k) merges, matching the operator's contract."""
    grams: dict[tuple[str, ...], int] = {}
    toks = {
        d: " ".join(t.lower().split()).split(" ") if t is not None else []
        for d, t in texts.items()
    }
    for t in toks.values():
        for i in range(len(t) - k + 1):
            g = tuple(t[i : i + k])
            grams[g] = grams.get(g, 0) + 1
    out = set()
    for d, t in toks.items():
        starts = [
            i
            for i in range(len(t) - k + 1)
            if grams[tuple(t[i : i + k])] >= 2
        ]
        if not starts:
            continue
        run_start = starts[0]
        prev = starts[0]
        for s in starts[1:] + [None]:
            if s is not None and s - prev <= k:
                prev = s
                continue
            out.add((d, run_start, prev + k - 1))
            if s is not None:
                run_start = prev = s
    return out


def _random_corpus(seed: int) -> dict[int, str]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → organic collisions
    shared = [
        [rng.choice(vocab) for _ in range(rng.randint(K, 2 * K + 3))]
        for _ in range(3)
    ]
    docs = {}
    for d in range(8):
        body: list[str] = []
        for _ in range(rng.randint(0, 4)):
            if rng.random() < 0.5:
                body.extend(rng.choice(shared))
            body.extend(rng.choice(vocab) for _ in range(rng.randint(0, 9)))
        docs[d] = " ".join(body)
    docs[8] = None  # NULL text: no spans, trims to ('', 0)
    docs[9] = ""  # empty text: one empty token, never duplicated at k=5
    return docs


@pytest.mark.parametrize("seed", [11, 23, 37, 51, 73])
def test_matches_naive_oracle(spark, seed):
    docs = _random_corpus(seed)
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()],
        schema="doc_id bigint, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_spans(df, k=K).collect()
    }
    assert got == _naive_spans(docs, K)


def _naive_trim(texts: dict[int, str], k: int) -> dict[int, tuple[str, int]]:
    """(clean_text, n_kept) by direct enumeration from the naive span
    oracle: drop every token position covered by a span, rejoin."""
    spans = _naive_spans(texts, k)
    toks = {
        d: " ".join(t.lower().split()).split(" ") if t is not None else []
        for d, t in texts.items()
    }
    out = {}
    for d, t in toks.items():
        covered = set()
        for sd, s, e in spans:
            if sd == d:
                covered.update(range(s, e + 1))
        kept = [w for i, w in enumerate(t) if i not in covered]
        out[d] = (" ".join(kept), len(kept))
    return out


@pytest.mark.parametrize("seed", [11, 23, 37, 51, 73])
def test_trim_matches_naive_oracle(spark, seed):
    """Differential for the round-6 in-row rebuild (interval-list join +
    indexed filter + disjoint-span n_kept arithmetic): clean_text and
    n_kept must equal the naive cut on every random corpus the span
    oracle already covers."""
    from land_registry_data_ingestion_spark.operators.spans import (
        trim_duplicated_spans,
    )

    docs = _random_corpus(seed)
    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in docs.items()],
        schema="doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_kept)
        for r in trim_duplicated_spans(df, k=K).collect()
    }
    assert got == _naive_trim(docs, K)
