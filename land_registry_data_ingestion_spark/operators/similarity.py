"""Similarity search over embedding columns (scale-out §8).

- ``cosine_pairs``: threshold similarity self-join. Brute force is O(n²)
  and only acceptable inside buckets; the public entry points bucket first.
- ``brute_force_topk``: exact top-k for a (small) query set against the
  full corpus — the correctness baseline. Queries broadcast; corpus never
  shuffles; per-partition heap via groupBy + window.
- ``lsh_bucketed_pairs``: random-hyperplane LSH — sign bits of projections
  onto deterministic pseudo-random hyperplanes form a bucket key; near
  neighbors collide with high probability. Shuffle is O(n·tables), the
  100 TB path. Hyperplanes derive from md5 bits, so runs are reproducible
  without RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from land_registry_data_ingestion_spark.functions.vectors import (
    cosine_similarity,
    l2_norm,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); ranking ties
    break on neighbor id for determinism. Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding near-dup
    detection. Brute-force form; compose with LSH buckets at scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(cosine_similarity(F.col("vec_a"), F.col("vec_b")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _hyperplane(dim: int, table: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bits."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{table}|{plane}|{d}".encode()).hexdigest()
        vals.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)  # ≈ U(-1, 1)
    return vals


def lsh_bucket_key(
    vec: Column, dim: int, table: int, n_planes: int = 8
) -> Column:
    """Sign-bit bucket key of ``vec`` for one LSH table."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, table, p)])
        dot = F.aggregate(
            F.zip_with(vec.cast("array<double>"), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_tables: int = 4,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate cosine-threshold pairs: candidates collide in ≥1 LSH
    table, then exact cosine verifies. Shuffle O(n·tables)."""
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket_key(F.col(vec_col), dim, t, n_planes).alias("bkt"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "vec", "tb.tbl", "tb.bkt")
    a = keyed.select("tbl", "bkt", F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = keyed.select("tbl", "bkt", F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    cands = (
        a.join(b, ["tbl", "bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "vec_a", "vec_b")
        .distinct()
    )
    return (
        cands.withColumn(
            "cosine", F.round(cosine_similarity(F.col("vec_a"), F.col("vec_b")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def normalize_vectors(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit_vec"
) -> DataFrame:
    """Unit-normalize embeddings (precompute once, store, reuse — at scale
    normalization is a write-time transform, not a query-time one)."""
    vec = F.col(vec_col).cast("array<double>")
    norm = l2_norm(F.col(vec_col))
    return df.withColumn(out_col, F.transform(vec, lambda x: x / norm))
