"""Edge-case tests for corpus curation operators (oracle queries cover
the main paths; these pin boundary behavior the sf tables don't hit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.corpus import (
    decontaminate,
    pack_sequences,
    segment_dedup,
    stratified_sample,
)
from land_registry_data_ingestion_spark.operators.similarity import knn_classify
from land_registry_data_ingestion_spark.util import release_caches


@pytest.fixture(autouse=True)
def _release(spark):
    yield
    release_caches()


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_decontaminate_empty_benchmark(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "x y z w")])
    bench = docs.filter(F.lit(False))
    out = {r["doc_id"]: r for r in decontaminate(docs, bench).collect()}
    assert all(not out[d]["is_contaminated"] for d in (1, 2))
    assert all(out[d]["n_bench_shingles"] == 0 for d in (1, 2))


def test_decontaminate_counts_distinct_shared_shingles(spark):
    # doc 3 shares exactly the two 3-gram shingles of "a b c d" ("a b c",
    # "b c d"); doc 4 shares nothing.
    docs = _docs(spark, [(3, "a b c d zz"), (4, "p q r s")])
    bench = _docs(spark, [(9, "a b c d")])
    out = {r["doc_id"]: r for r in decontaminate(docs, bench).collect()}
    assert out[3]["n_bench_shingles"] == 2 and out[3]["is_contaminated"]
    assert out[4]["n_bench_shingles"] == 0 and not out[4]["is_contaminated"]


def test_segment_dedup_keeps_first_occurrence_only(spark):
    seg = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    docs = _docs(
        spark,
        [
            (1, f"{seg} unique1 tail"),
            (2, f"{seg} other2 words"),  # repeated leading segment
        ],
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    assert out[1]["clean_text"].startswith(seg)
    assert out[1]["n_dropped_segments"] == 0
    # doc 2 lost the repeated segment but kept its own remainder
    assert out[2]["n_dropped_segments"] == 1
    assert out[2]["clean_text"] == "other2 words"


def test_segment_dedup_duplicate_within_one_doc(spark):
    seg = " ".join(f"t{i}" for i in range(10))
    docs = _docs(spark, [(1, f"{seg} {seg}")])
    row = segment_dedup(docs).collect()[0]
    assert row["n_dropped_segments"] == 1
    assert row["clean_text"] == seg


def test_pack_sequences_chunking(spark):
    df = spark.createDataFrame(
        [("s", i, " ".join(["w"] * 300)) for i in range(4)],
        ["source", "doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(df, budget=512, part_col="source").collect()
    }
    # cumulative starts: 0, 300, 600, 900 → seq ids 0,0,1,1
    assert [rows[i]["seq_id"] for i in range(4)] == [0, 0, 1, 1]
    assert [rows[i]["seq_offset"] for i in range(4)] == [0, 300, 88, 388]


def test_stratified_sample_rate_zero_and_full(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "zh") for i in range(200)],
        ["doc_id", "lang"],
    )
    kept = stratified_sample(df, {"en": 0, "zh": 1000}, default_per_mille=0)
    langs = {r["lang"] for r in kept.collect()}
    assert langs == {"zh"}
    assert kept.count() == 100


def test_knn_classify_majority_and_tiebreak(spark):
    # probe 100 sits exactly between two labeled families: 3 votes for
    # label 1 (closest) vs 2 for label 7 → majority wins.
    def v(x, y):
        return [float(x), float(y)]

    corpus = spark.createDataFrame(
        [
            (1, v(1, 0), 1),
            (2, v(0.99, 0.1), 1),
            (3, v(0.98, 0.15), 1),
            (4, v(0, 1), 7),
            (5, v(0.1, 0.99), 7),
        ],
        ["vec_id", "embedding", "label"],
    )
    probes = spark.createDataFrame(
        [(100, v(0.9, 0.2))], ["vec_id", "embedding"]
    )
    out = knn_classify(corpus, probes, k=5).collect()
    assert len(out) == 1
    assert out[0]["predicted_label"] == 1
    assert out[0]["n_votes"] == 3


def test_segment_dedup_token_counts_matches_string_path(spark):
    """The fused counts path must equal token_count over the unfused
    clean_text for every doc — including all-dropped docs (0), short
    tails, and docs with messy whitespace/empty text."""
    from land_registry_data_ingestion_spark.functions.text import token_count
    from land_registry_data_ingestion_spark.operators.corpus import (
        segment_dedup,
        segment_dedup_token_counts,
    )

    boiler = " ".join(f"b{i}" for i in range(10))
    rows = [
        (1, boiler + " " + " ".join(f"x{i}" for i in range(13))),
        (2, boiler),                       # fully duplicated vs doc 1 → 0
        (3, "  one   two\tthree "),        # short tail segment + whitespace
        (4, ""),                           # empty: absent from both
        (5, " ".join(f"y{i}" for i in range(25))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    try:
        fused = {
            r["doc_id"]: r["n_tokens"]
            for r in segment_dedup_token_counts(df, seg_len=10).collect()
        }
        unfused = {
            r["doc_id"]: r["n"]
            for r in segment_dedup(df, seg_len=10)
            .select(
                "doc_id", token_count(F.col("clean_text")).alias("n")
            )
            .collect()
        }
    finally:
        release_caches()
    assert fused == unfused
    assert fused[2] == 0 and fused[4 if 4 in fused else 2] == 0
    assert 4 not in fused  # empty text yields no segments on either path


def test_knn_classify_excludes_null_labels(spark):
    """Unlabeled corpus rows neither vote nor occupy k-slots: with k=3,
    two NULL-labeled vectors closer than every labeled one must not
    displace labeled neighbors (round-8 adversarial gate — a NULL
    'label' also tie-breaks differently across engines)."""

    def v(x, y):
        return [float(x), float(y)]

    corpus = spark.createDataFrame(
        [
            (1, v(0.99, 0.01), None),   # closest, unlabeled
            (2, v(0.98, 0.02), None),   # second closest, unlabeled
            (3, v(0.9, 0.1), 4),
            (4, v(0.88, 0.12), 4),
            (5, v(0.1, 0.9), 9),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    probes = spark.createDataFrame(
        [(100, v(1.0, 0.0))], ["vec_id", "embedding"]
    )
    out = knn_classify(corpus, probes, k=3).collect()
    assert len(out) == 1
    assert out[0]["predicted_label"] == 4
    assert out[0]["n_votes"] == 2


def test_dsir_weights_edge_documents(spark):
    """Round-8 contract pins: (a) documents whose text normalizes to ''
    (NULL / empty / whitespace-only) carry no weight row at all — no
    phantom ''-token scoring; (b) a NULL target-filter verdict counts
    the document as RAW, not as unclassifiable."""
    from pyspark.sql import functions as F

    from land_registry_data_ingestion_spark.operators.corpus import (
        dsir_importance_weights,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en"),
            (2, "alpha beta delta", "fr"),
            (3, None, "en"),
            (4, "", "en"),
            (5, " \t\n ", "en"),
            (6, "alpha beta", None),  # NULL lang → raw
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance_weights(
            df, target_filter=F.col("lang") == "en"
        ).collect()
    }
    assert set(out) == {1, 2, 6}
    assert out[6]["is_target"] is False
    # doc 6's tokens are a subset of the target doc's — its raw counts
    # must have entered the histogram (weight differs from doc 2's,
    # which shares 2 of 3 tokens but adds a raw-only token)
    assert out[1]["is_target"] is True
    assert out[2]["is_target"] is False
