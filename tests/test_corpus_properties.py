"""Property-based corpus-operator tests: conservation and boundary
invariants the example-based tests can't sweep."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from land_registry_data_ingestion_spark.operators.corpus import (
    pack_sequences,
    segment_dedup,
)
from land_registry_data_ingestion_spark.util import release_caches

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Small token alphabet → natural collisions between docs
_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_doc = st.lists(_word, min_size=1, max_size=35).map(" ".join)


@settings(**_SETTINGS)
@given(
    docs=st.lists(_doc, min_size=1, max_size=6),
    budget=st.integers(min_value=1, max_value=40),
)
def test_pack_sequences_invariants(spark, docs, budget):
    """(a) token counts conserved; (b) offsets in [0, budget); (c) within
    a shard, seq_id is the floor of the running-start / budget — so ids
    are non-decreasing in doc order and the whole stream is covered with
    no gaps beyond one budget per doc."""
    df = spark.createDataFrame(
        [("s", i, t) for i, t in enumerate(docs)], ["source", "doc_id", "text"]
    )
    rows = sorted(
        pack_sequences(df, budget=budget).collect(), key=lambda r: r["doc_id"]
    )
    release_caches()
    expected_n = [len(t.split()) for t in docs]
    assert [r["n_tokens"] for r in rows] == expected_n

    start = 0
    for r in rows:
        assert 0 <= r["seq_offset"] < budget
        assert r["seq_offset"] == start % budget
        assert r["seq_id"] == start // budget
        start += r["n_tokens"]


@settings(**_SETTINGS)
@given(docs=st.lists(_doc, min_size=1, max_size=5))
def test_segment_dedup_conservation(spark, docs):
    """Kept + dropped segment counts equal the original segment count per
    doc, each distinct segment survives exactly once corpus-wide, and the
    cleaned text is a subsequence of the original's segments."""
    seg_len = 4
    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    out = {
        r["doc_id"]: r for r in segment_dedup(df, seg_len=seg_len).collect()
    }
    release_caches()

    def segs(text: str) -> list[str]:
        toks = text.split()
        return [
            " ".join(toks[i : i + seg_len]) for i in range(0, len(toks), seg_len)
        ]

    all_kept: list[str] = []
    for i, text in enumerate(docs):
        original = segs(text)
        kept = out[i]["clean_text"].split() and segs_from_clean(
            out[i]["clean_text"], original, seg_len
        ) or []
        assert out[i]["n_dropped_segments"] == len(original) - len(kept)
        # kept segments appear in original order
        it = iter(original)
        assert all(any(k == o for o in it) for k in kept)
        all_kept.extend(kept)

    # corpus-wide: every distinct segment of the input survives exactly once
    distinct_input = {s for t in docs for s in segs(t)}
    assert sorted(all_kept) == sorted(distinct_input)


def segs_from_clean(clean: str, original: list[str], seg_len: int) -> list[str]:
    """Split the cleaned text back into the kept segments: all kept
    segments except possibly the doc's (short) tail have seg_len words, so
    greedily re-chunking by matching against the original's segment
    multiset reconstructs them."""
    toks = clean.split()
    remaining = list(original)
    kept: list[str] = []
    i = 0
    while i < len(toks):
        # try the longest candidate first (seg_len), else shrink — a short
        # segment can only be a doc tail
        for L in range(min(seg_len, len(toks) - i), 0, -1):
            cand = " ".join(toks[i : i + L])
            if cand in remaining:
                kept.append(cand)
                remaining.remove(cand)
                i += L
                break
        else:
            raise AssertionError(f"cannot reconstruct segments from {clean!r}")
    return kept
