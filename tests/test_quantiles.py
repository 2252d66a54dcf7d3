"""grouped_exact_quantiles edge cases (the declared query's DuckDB
quantile_cont oracle covers the bulk path)."""

from __future__ import annotations

import numpy as np
import pytest

from land_registry_data_ingestion_spark.operators.binning import (
    grouped_exact_quantiles,
)


def _got(spark, rows, probs):
    df = spark.createDataFrame(rows, ["g", "v"])
    out = grouped_exact_quantiles(df, ["g"], "v", probs)
    return {(r["g"], r["pct"]): r["val"] for r in out.collect()}


def test_matches_numpy_type7(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    probs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = _got(spark, [("a", v) for v in vals], probs)
    for p in probs:
        expect = float(np.quantile(vals, p))  # numpy default = type 7
        assert got[("a", p)] == pytest.approx(expect, abs=1e-12), p


def test_single_value_group(spark):
    got = _got(spark, [("a", 42.0)], [0.25, 0.5, 1.0])
    assert got == {("a", 0.25): 42.0, ("a", 0.5): 42.0, ("a", 1.0): 42.0}


def test_groups_independent(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0)]
    got = _got(spark, rows, [0.5])
    assert got[("a", 0.5)] == 2.0 and got[("b", 0.5)] == 20.0


def test_ties_and_integer_index(spark):
    # n=5, p=0.5 -> k exactly 2 (0-based): no interpolation
    rows = [("a", v) for v in [1.0, 2.0, 2.0, 2.0, 7.0]]
    got = _got(spark, rows, [0.5])
    assert got[("a", 0.5)] == 2.0


def test_null_values_excluded_like_quantile_cont(spark):
    """quantile_cont / numpy quantile IGNORE NULL values. Before the
    isNotNull filter, NULLs ranked first in the window and shifted
    every quantile down: median of [1, 2, NULL] came out 1.0 instead of
    1.5. All-NULL groups must vanish, matching the SQL aggregate."""
    from land_registry_data_ingestion_spark.operators.binning import (
        grouped_exact_quantiles,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("b", None), ("b", None)],
        "grp string, x double",
    )
    rows = grouped_exact_quantiles(df, ["grp"], "x", [0.5]).collect()
    assert {(r["grp"], r["pct"], r["val"]) for r in rows} == {("a", 0.5, 1.5)}
