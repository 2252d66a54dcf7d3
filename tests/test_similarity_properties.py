"""Property-based degenerate-vector tests: for ARBITRARY mixtures of
finite, zero-norm, NaN-lane, and ±Inf-lane vectors — any counts, any
positions, including the all-degenerate and empty extremes — the ANN
family must (a) never crash, (b) never emit a degenerate id as query or
neighbor, and (c) where the operator pre-filters both sides itself
(pq_topk, brute_force_topk), return EXACTLY what it returns on the
pre-filtered finite corpus. The round-8/9 adversarial gates check fixed
perturbation patterns; these drive the same contracts across the whole
input space."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.similarity import (
    _finite_vec,
    brute_force_topk,
    ivf_topk,
    pq_topk,
    semantic_dedup,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DIM = 4

# per-row: (kind, 4 finite components). Degenerate kinds overwrite lanes.
_row = st.tuples(
    st.sampled_from(["finite", "zero", "nan", "inf", "neginf"]),
    st.lists(
        st.floats(
            min_value=-2.0, max_value=2.0, allow_nan=False, allow_infinity=False
        ),
        min_size=_DIM,
        max_size=_DIM,
    ),
)
_corpus = st.lists(_row, min_size=0, max_size=10)


def _materialize(spark, rows):
    data = []
    degenerate_ids = set()
    for i, (kind, comps) in enumerate(rows):
        v = list(comps)
        if kind == "zero":
            v = [0.0] * _DIM
            degenerate_ids.add(i)  # zero norm: no cosine — never ranks
        elif kind == "nan":
            v[i % _DIM] = float("nan")
            degenerate_ids.add(i)
        elif kind == "inf":
            v[i % _DIM] = float("inf")
            degenerate_ids.add(i)
        elif kind == "neginf":
            v[(i + 1) % _DIM] = float("-inf")
            degenerate_ids.add(i)
        data.append((i, v))
    df = spark.createDataFrame(
        data, "vec_id bigint, embedding array<double>"
    ) if data else spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    return df, degenerate_ids


def _sorted_rows(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return sorted(
        tuple(None if isinstance(x, float) and math.isnan(x) else x for x in t)
        for t in pdf[cols].itertuples(index=False, name=None)
    )


@settings(**_SETTINGS)
@given(rows=_corpus)
def test_pq_topk_equals_finite_only_run(spark, rows):
    """pq_topk pre-filters both sides, so the mixed corpus must give the
    EXACT result of the finite-only corpus — degenerate rows are inert,
    not merely non-crashing. Zero vectors are finite for L2 and stay."""
    df, _ = _materialize(spark, rows)
    # L2 degeneracy is non-finiteness only (zero vectors are valid) —
    # the same predicate the operator applies internally
    finite = df.filter(_finite_vec(F.col("embedding")))
    mixed = pq_topk(df, df, m=2, n_codes=4, k=3)
    clean = pq_topk(finite, finite, m=2, n_codes=4, k=3)
    assert _sorted_rows(mixed) == _sorted_rows(clean)


@settings(**_SETTINGS)
@given(rows=_corpus)
def test_brute_force_topk_never_ranks_degenerate(spark, rows):
    df, degenerate = _materialize(spark, rows)
    got = brute_force_topk(df, df, k=3).collect()
    for r in got:
        assert r["query_id"] not in degenerate
        assert r["neighbor_id"] not in degenerate
        assert r["cosine"] is not None and math.isfinite(r["cosine"])


@settings(**_SETTINGS)
@given(rows=_corpus)
def test_ivf_topk_and_semantic_dedup_tolerate_any_mixture(spark, rows):
    """ivf_topk seeds from raw ids (deterministic replay contract), so no
    finite-only equality claim — but degenerate ids must never surface
    in results, and semantic_dedup must never mark one a duplicate (a
    degenerate vector has no cosine, so the drop rule can't reach it)."""
    df, degenerate = _materialize(spark, rows)
    for r in ivf_topk(df, df, n_centroids=4, nprobe=2, k=3).collect():
        assert r["query_id"] not in degenerate
        assert r["neighbor_id"] not in degenerate
    for r in semantic_dedup(df, n_clusters=4, threshold=0.9).collect():
        if r["vec_id"] in degenerate:
            assert r["is_duplicate"] is False
