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


# --- IVF (inverted-file) ANN ------------------------------------------------


def seed_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
) -> DataFrame:
    """Deterministic coarse quantizer: the ``n_centroids`` smallest-id
    vectors. At cluster scale these seeds would be refined with distributed
    k-means (k-means|| init); the seeded form is kept as-is here so a
    second engine can rebuild the identical index with no RNG state."""
    return corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids)


def _centroid_literal(
    centroids: DataFrame, id_col: str, vec_col: str
) -> Column:
    """Collect the (small by construction) centroid set to the driver and
    embed it as a literal array<struct<cid,cvec>> so both index build and
    probe selection are row-local expressions — no join, no shuffle."""
    rows = centroids.select(id_col, vec_col).collect()
    # one array<double> literal per centroid (not 64 nested lits) keeps the
    # expression tree small — analysis/codegen cost stays O(n_centroids)
    return F.array(
        *[
            F.struct(
                F.lit(int(r[0])).cast("long").alias("cid"),
                F.lit([float(x) for x in r[1]]).alias("cvec"),
            )
            for r in rows
        ]
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Index build: attach ``centroid_id`` = argmax-cosine centroid to each
    corpus vector. Pure map (centroids are a broadcast literal; argmax is
    struct-max over an array) — at 100 TB the build costs one scan, and the
    assigned table is then written partitioned/bucketed by ``centroid_id``
    so probes prune partitions."""
    return _ivf_assign_with(
        corpus, _centroid_literal(centroids, id_col, vec_col), vec_col
    )


def _ivf_assign_with(
    corpus: DataFrame, cents: Column, vec_col: str
) -> DataFrame:
    scored = F.transform(
        cents,
        lambda c: F.struct(
            F.round(cosine_similarity(F.col(vec_col), c["cvec"]), 6).alias("cos"),
            (-c["cid"]).alias("ncid"),
        ),
    )
    # struct max orders by (cos, ncid): highest cosine, ties → smallest cid.
    best = F.array_max(scored)
    return corpus.withColumn("centroid_id", (-best["ncid"]).cast("long"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 10,
) -> DataFrame:
    """Approximate top-k cosine search: probe the ``nprobe`` nearest
    inverted lists per query, exact-score only those lists.

    Scan cost per query is nprobe/n_centroids of the corpus (vs 1.0 for
    brute force); the probe side is tiny and broadcast, so the only big
    data movement is the pruned corpus read."""
    centroids = seed_centroids(corpus, id_col, vec_col, n_centroids)
    # collect the seeds once; index build and probe selection share them
    cents = _centroid_literal(centroids, id_col, vec_col)
    assigned = _ivf_assign_with(corpus, cents, vec_col)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    probe_scored = F.transform(
        cents,
        lambda c: F.struct(
            (-F.round(cosine_similarity(F.col("q_vec"), c["cvec"]), 6)).alias(
                "ncos"
            ),
            c["cid"].alias("cid"),
        ),
    )
    # ascending sort on (ncos, cid) = best cosine first, ties → smallest cid
    probes = q.withColumn(
        "centroid_id",
        F.explode(
            F.transform(
                F.slice(F.array_sort(probe_scored), 1, nprobe),
                lambda p: p["cid"],
            )
        ),
    )
    c = assigned.select(
        "centroid_id",
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
    )
    scored = (
        c.join(F.broadcast(probes), "centroid_id")
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


def normalize_vectors(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit_vec"
) -> DataFrame:
    """Unit-normalize embeddings (precompute once, store, reuse — at scale
    normalization is a write-time transform, not a query-time one)."""
    vec = F.col(vec_col).cast("array<double>")
    norm = l2_norm(F.col(vec_col))
    return df.withColumn(out_col, F.transform(vec, lambda x: x / norm))
