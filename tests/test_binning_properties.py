"""Property-based interval-binning tests (SURVEY Q2): every in-range value
lands in exactly one (lo, hi] bin; out-of-range values drop."""

from __future__ import annotations

import bisect

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from land_registry_data_ingestion_spark.operators.binning import (
    bin_into_intervals,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=100), min_size=1, max_size=30
    ),
    edges=st.lists(
        st.integers(min_value=0, max_value=100),
        min_size=2,
        max_size=10,
        unique=True,
    ),
)
def test_every_value_lands_in_its_unique_bin(spark, values, edges):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], ["i", "v"])
    edf = spark.createDataFrame([(e,) for e in edges], ["edge"])
    got = {
        r["i"]: (r["bin_lo"], r["bin_hi"])
        for r in bin_into_intervals(df, "v", edf, "edge").collect()
    }

    sorted_edges = sorted(edges)
    for i, v in enumerate(values):
        if sorted_edges[0] < v <= sorted_edges[-1]:
            # expected bin via bisect on the sorted edge list
            j = bisect.bisect_left(sorted_edges, v)
            assert got[i] == (sorted_edges[j - 1], sorted_edges[j]), (
                v,
                sorted_edges,
            )
        else:
            assert i not in got  # outside every interval → dropped
