"""BPE training parity vs an independent pure-Python reference
(operators/bpe.py). The reference below follows Sennrich et al. 2016's
published algorithm directly — dict-of-tuples state, full recount per
round — deliberately sharing no code with the distributed operator."""

from __future__ import annotations

import collections

from pyspark.sql import Row

from land_registry_data_ingestion_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    train_bpe,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the newest gadget is the widest",
]


def _reference_bpe(texts, n_merges, min_pair_freq=2):
    vocab = collections.Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split():
            vocab[tuple(list(w) + [END_OF_WORD])] += 1
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for word, freq in vocab.items():
            for i in range(len(word) - 1):
                counts[(word[i], word[i + 1])] += freq
        eligible = {p: c for p, c in counts.items() if c >= min_pair_freq}
        if not eligible:
            break
        best = min(eligible.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = collections.Counter()
        for word, freq in vocab.items():
            out, i = [], 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and (word[i], word[i + 1]) == best
                ):
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def _df(spark, texts=CORPUS):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_merge_sequence_matches_reference(spark):
    got = train_bpe(_df(spark), n_merges=12)
    want = _reference_bpe(CORPUS, n_merges=12)
    assert got == want
    assert len(got) > 5  # the corpus supports a real merge sequence


def test_stops_when_no_pair_reaches_threshold(spark):
    got = train_bpe(_df(spark, ["ab", "cd", "ef"]), n_merges=10)
    assert got == []


def test_encode_applies_merges_in_rank_order(spark):
    merges = train_bpe(_df(spark), n_merges=12)
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_encode(_df(spark), merges).collect()
    }
    # 'low' appears 5x: after enough merges it encodes as one symbol.
    low_doc = out[0]
    assert low_doc.count("low" + END_OF_WORD) == 5 or "low" in low_doc
    # round-trip: stripping merge boundaries recovers the characters
    flat = "".join(t.replace(END_OF_WORD, " ") for t in out[4]).strip()
    assert flat == "the newest gadget is the widest"


def test_merge_table_round_trips(spark, tmp_path):
    from land_registry_data_ingestion_spark.operators.bpe import (
        load_merges,
        save_merges,
    )

    merges = train_bpe(_df(spark), n_merges=6)
    path = str(tmp_path / "merges.jsonl")
    save_merges(merges, path)
    assert load_merges(path) == merges
    # encoding with the loaded table matches encoding with the live one
    a = {r.doc_id: r.bpe_tokens for r in bpe_encode(_df(spark), merges).collect()}
    b = {
        r.doc_id: r.bpe_tokens
        for r in bpe_encode(_df(spark), load_merges(path)).collect()
    }
    assert a == b


def test_deep_merge_counts_stay_flat(spark):
    """Regression: the merge loop must survive merge counts far past the
    dozen the parity tests use. Before lineage truncation, every round
    left the plan one persisted select deeper and Catalyst re-analyzed
    the whole tree per action — a driver-heap OOM at ~60 rounds. A
    vocabulary-rich corpus (distinct repeated pseudo-words) keeps ≥60
    merges productive; parity vs the Sennrich reference must hold for
    the full deep sequence, not just the first few rounds."""
    import random

    rng = random.Random(7)
    alphabet = "abcdefghij"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 12)))
        for _ in range(80)
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(30)) for _ in range(40)
    ]
    got = train_bpe(_df(spark, texts), n_merges=60)
    want = _reference_bpe(texts, n_merges=60)
    assert len(got) == 60, "corpus did not sustain 60 productive merges"
    assert got == want
