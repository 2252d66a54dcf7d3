"""Scalar column functions: calendar, hashing, text, vector math.

Everything here returns Spark ``Column`` expressions built from
``pyspark.sql.functions`` — JVM-side, codegen-friendly, no Python UDFs.
"""

from land_registry_data_ingestion_spark.functions.datetime_fns import (
    nth_working_day_of_month,
    publish_datestamp,
    threshold_datestamp,
)
from land_registry_data_ingestion_spark.functions.text import (
    fingerprint,
    normalize_text,
    punct_ratio,
    token_count,
    tokens,
    word_shingles,
)
from land_registry_data_ingestion_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "nth_working_day_of_month",
    "publish_datestamp",
    "threshold_datestamp",
    "normalize_text",
    "tokens",
    "token_count",
    "punct_ratio",
    "fingerprint",
    "word_shingles",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
