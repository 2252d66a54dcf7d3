"""Unit tests: working-day calendar (F5-F8), text and vector functions."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.functions.datetime_fns import (
    next_publish_datestamp,
    nth_working_day_of_month,
    publish_datestamp,
    threshold_datestamp,
)
from land_registry_data_ingestion_spark.functions.text import (
    normalize_text,
    token_count,
    word_shingles,
)
from land_registry_data_ingestion_spark.functions.vectors import (
    cosine_similarity,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _date(y, m, d):
    return datetime.date(y, m, d)


def test_nth_working_day(spark):
    # Jan 2024 starts on a Monday; the 20th working day is Fri Jan 26.
    col = nth_working_day_of_month(F.lit("2024-01-15").cast("date"), 20)
    assert _one(spark, col) == _date(2024, 1, 26)
    # Feb 2015: Feb 1 is a Sunday → 20th working day is Fri Feb 27.
    col = nth_working_day_of_month(F.lit("2015-02-03").cast("date"), 20)
    assert _one(spark, col) == _date(2015, 2, 27)
    # n beyond the month's working days → null (reference raises).
    col = nth_working_day_of_month(F.lit("2024-02-10").cast("date"), 22)
    assert _one(spark, col) is None


def test_publish_and_threshold(spark):
    # 2024-01-10 is before Jan's 20th working day (Jan 26) → previous
    # month's: Dec 2023's 20th working day is Thu Dec 28.
    col = publish_datestamp(F.lit("2024-01-10").cast("date"))
    assert _one(spark, col) == _date(2023, 12, 28)
    # on/after the publish day → this month's.
    col = publish_datestamp(F.lit("2024-01-26").cast("date"))
    assert _one(spark, col) == _date(2024, 1, 26)
    col = threshold_datestamp(F.lit("2024-01-26").cast("date"))
    assert _one(spark, col) == _date(2024, 1, 31)
    # Feb 2024 starts on a Thursday: 2+5+5+5 weekdays reach Feb 23 (17th),
    # so the 20th working day is Wed Feb 28.
    col = next_publish_datestamp(F.lit("2024-01-31").cast("date"))
    assert _one(spark, col) == _date(2024, 2, 28)


def test_normalize_and_tokens(spark):
    col = normalize_text(F.lit("  Hello\t WORLD  \n again "))
    assert _one(spark, col) == "hello world again"
    assert _one(spark, token_count(F.lit("a b  c"))) == 3
    assert _one(spark, token_count(F.lit("   "))) == 0
    assert _one(spark, token_count(F.lit(""))) == 0


def test_word_shingles(spark):
    col = word_shingles(F.lit("a b c d"), 3)
    assert _one(spark, col) == ["a b c", "b c d"]
    # shorter than k → empty, not an error
    col = word_shingles(F.lit("a b"), 3)
    assert _one(spark, col) == []
    # duplicates collapse
    col = word_shingles(F.lit("x y x y x y"), 2)
    assert sorted(_one(spark, col)) == ["x y", "y x"]


def test_cosine_similarity(spark):
    a = F.array(*[F.lit(float(x)) for x in (1.0, 2.0, 3.0)])
    b = F.array(*[F.lit(float(x)) for x in (2.0, 4.0, 6.0)])
    c = F.array(*[F.lit(float(x)) for x in (-2.0, 1.0, 0.0)])
    assert math.isclose(_one(spark, cosine_similarity(a, b)), 1.0)
    assert abs(_one(spark, cosine_similarity(a, c))) < 1e-12
