"""Local replica of the driver's oracle-differential gate.

Runs a declared Spark query and its DuckDB oracle on the same parquet
tables and compares: column names (sorted), row counts, and values
(row-sorted, order-insensitive). Floats must match to the bit after the
query's own explicit rounding — if they don't, the query's rounding
contract is wrong and the driver's value-hash would fail too.
"""

from __future__ import annotations

import math
from typing import Any

import pandas as pd


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def _is_null(x: Any) -> bool:
    # None, float NaN, and pandas NaT (which is != itself, like NaN, but
    # not a float — a NaT-vs-NaT cell compared as values would falsely
    # mismatch a NULL group key both engines agree on)
    if x is None:
        return True
    if isinstance(x, float):
        return math.isnan(x)
    return x is pd.NaT


def _cell_equal(a: Any, b: Any) -> bool:
    a_null = _is_null(a)
    b_null = _is_null(b)
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def compare_results(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return [f"{name}: column mismatch spark={s_cols} duck={d_cols}"]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(
            f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
        )
        return problems
    s = normalize_frame(spark_pdf)
    d = normalize_frame(duck_pdf)
    # timestamps → naive python datetimes on both sides
    for col in s.columns:
        for frame in (s, d):
            if str(frame[col].dtype).startswith("datetime"):
                frame[col] = frame[col].dt.to_pydatetime()
    n_bad = 0
    for i in range(len(s)):
        for col in s.columns:
            if not _cell_equal(s.at[i, col], d.at[i, col]):
                n_bad += 1
                if n_bad <= 5:
                    problems.append(
                        f"{name}: row {i} col {col}: "
                        f"spark={s.at[i, col]!r} duck={d.at[i, col]!r}"
                    )
    if n_bad > 5:
        problems.append(f"{name}: ... {n_bad} mismatched cells total")
    return problems


def run_compare(spark, duck, fn, sql: str, sf_dir: str, name: str) -> list[str]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(sql).fetchdf()
    return compare_results(spark_pdf, duck_pdf, name)
