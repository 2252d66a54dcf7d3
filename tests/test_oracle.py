"""Oracle-differential tests: every declared query vs DuckDB at sf0.01.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): same
column names, same row multiset, bit-identical values after each query's
own rounding.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS
from tests.oracle_harness import run_compare

from land_registry_data_ingestion_spark.plans.registry import (
    _load_all,
    REGISTRY,
)

_load_all()
_SQL_CHECKED = [n for n, s in REGISTRY.items() if s.sql is not None]
_ROWS_ONLY = [n for n, s in REGISTRY.items() if s.sql is None]


@pytest.mark.parametrize("name", _SQL_CHECKED)
def test_oracle_match(spark, duck, name):
    spec = REGISTRY[name]
    problems = run_compare(spark, duck, spec.fn, spec.sql, SF_CORRECTNESS, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_CORRECTNESS)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
