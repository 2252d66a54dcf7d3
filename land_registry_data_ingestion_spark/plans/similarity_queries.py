"""Similarity-search queries over ``embeddings`` (scale-out §8).

Cosine arithmetic parity: both sides cast float[] → double[] and fold
left-to-right in double precision, then round to 6 dp, so the value hash
compares equal bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from land_registry_data_ingestion_spark.operators.similarity import (
    blocked_cosine_pairs,
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_pairs,
)
from land_registry_data_ingestion_spark.plans.registry import query
from land_registry_data_ingestion_spark.sources.parquet import load_tables

_DIM = 64  # embeddings table dimension (TESTDATA)


def _nan_null(expr: str) -> str:
    """Non-finite → NULL, stating the engine's degenerate-vector contract
    in DuckDB terms (adversarial-data round 8): a cosine involving a
    NaN/±Inf-component vector comes out NaN, which DuckDB orders ABOVE
    every real value — unguarded, it passes every ``>= threshold`` and
    ranks FIRST under ``DESC``. The engine maps it to NULL
    (``cosine_similarity``'s nanvl; the Arrow kernels mask every
    non-finite quotient to NaN, which crosses Arrow as NULL), where it
    fails filters and never ranks. Zero-norm vectors already agree:
    DuckDB division by zero is NULL. The guard is ``isfinite``, not
    ``NOT isnan``, to match the kernels' mask exactly; on the declared
    ``array<float>`` tables the two are equivalent (Cauchy–Schwarz in
    double arithmetic over float32 inputs rules out ±Inf quotients —
    the smallest float32 subnormal squared is ~1e-90, far above
    double underflow, so a nonzero norm product can never round to
    0.0)."""
    return f"(CASE WHEN isfinite({expr}) THEN {expr} ELSE NULL END)"


_COS_RAW = """
    ROUND(
      list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
      6)
"""
_COS = _nan_null(_COS_RAW)


@query(
    "sim_cosine_pairs",
    sql=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS} >= 0.4
    """,
)
def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-duplicate pairs (cosine ≥ 0.4) via the 2D
    block-partitioned theta join: every pair is compared exactly once, but
    the corpus is never broadcast and no BroadcastNestedLoopJoin appears —
    compute shards evenly over a plain hash join on the block-pair key,
    with the cosine verify on the Arrow fast path. At threshold 0.4 the
    unit-sphere radius (ε ≈ 1.10) rules out recall-1.0 LSH, so exact-
    blocked IS the scale-safe form; at near-dup thresholds (≥0.8) use
    sim_lsh_ann_pairs for sub-quadratic candidates."""
    t = load_tables(spark, sf_dir)
    return blocked_cosine_pairs(t.embeddings, threshold=0.4)


@query(
    "sim_topk_bruteforce",
    sql=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_nan_null('''ROUND(
                 list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
                 6)''')} AS cosine
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS BIGINT) AS rank
        FROM scored WHERE cosine IS NOT NULL
    ) WHERE rank <= 10
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for query vectors vec_id < 10 —
    queries broadcast, corpus scanned once, per-partition heap + merge."""
    t = load_tables(spark, sf_dir)
    queries = t.embeddings.filter(F.col("vec_id") < 10)
    return brute_force_topk(t.embeddings, queries, k=10)


def _cos_sql(x: str, y: str) -> str:
    """Guarded cosine (NaN → NULL, see ``_nan_null``) — every consumer
    wants the engine's undefined-never-ranks semantics."""
    return _nan_null(f"""ROUND(
      list_dot_product(CAST({x} AS DOUBLE[]), CAST({y} AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST({x} AS DOUBLE[]), CAST({x} AS DOUBLE[])))
         * sqrt(list_dot_product(CAST({y} AS DOUBLE[]), CAST({y} AS DOUBLE[])))),
      6)""")


def _ivf_sql(n_centroids: int = 16, nprobe: int = 4, k: int = 10) -> str:
    """DuckDB replay of the deterministic IVF index + nprobe search.

    Assignment/probe ordering coalesces the guarded cosine to -2.0 —
    the engine's degenerate sentinel (below every real cosine, ties to
    the smallest cid): a degenerate CENTROID must never win an
    assignment, and a degenerate VECTOR assigns to the smallest cid
    deterministically. NULL-cosine candidates never rank (engine filter
    in ``ivf_topk``)."""
    return f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT {n_centroids}
    ),
    assign AS (
        SELECT neighbor_id, embedding, cid AS centroid_id FROM (
            SELECT e.vec_id AS neighbor_id, e.embedding, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY COALESCE({_cos_sql('e.embedding', 'c.cvec')}, -2.0) DESC, c.cid ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY COALESCE({_cos_sql('q.embedding', 'c.cvec')}, -2.0) DESC, c.cid ASC
                   ) AS rn
            FROM embeddings q CROSS JOIN cents c
            WHERE q.vec_id < 10
        ) WHERE rn <= {nprobe}
    ),
    cand AS (
        SELECT p.query_id, a.neighbor_id,
               {_cos_sql('q.embedding', 'a.embedding')} AS cosine
        FROM probes p
        JOIN assign a ON a.centroid_id = p.cid
        JOIN embeddings q ON q.vec_id = p.query_id
        WHERE a.neighbor_id != p.query_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS BIGINT) AS rank
        FROM cand WHERE cosine IS NOT NULL
    ) WHERE rank <= {k}
    """


@query("sim_ivf_topk", sql=_ivf_sql())
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 for queries vec_id < 10: deterministic seeded coarse
    quantizer (16 lists), map-only index build, nprobe=4 search — the scale
    path for top-k (scans nprobe/n_centroids of the corpus per query).
    The oracle replays the identical index, so results match exactly."""
    t = load_tables(spark, sf_dir)
    queries = t.embeddings.filter(F.col("vec_id") < 10)
    return ivf_topk(t.embeddings, queries, n_centroids=16, nprobe=4, k=10)


def _lsh_sql(
    dim: int = 64,
    threshold: float = 0.4,
    n_tables: int = 4,
    n_planes: int = 8,
) -> str:
    """DuckDB replay of the hyperplane LSH: the planes are deterministic
    md5-derived constants, so they inline as literals (like the MinHash
    coefficients) and a second engine rebuilds the identical buckets.

    Non-finite vectors are excluded from bucketing on BOTH sides (the
    engine's ``_finite_vec`` filter in ``lsh_bucketed_pairs``): a
    NaN-lane plane dot signs differently per engine (DuckDB's
    ``>= 0`` is TRUE for NaN, numpy's is False), so without the filter
    the CANDIDATE sets diverge even though the exact-cosine verify
    drops those pairs everywhere — candidates, not just outputs, must
    stay replayable."""
    from land_registry_data_ingestion_spark.operators.similarity import (
        _hyperplane,
    )

    def bkt(table: int) -> str:
        bits = []
        for p in range(n_planes):
            plane = "[" + ", ".join(
                repr(v) for v in _hyperplane(dim, table, p)
            ) + "]"
            bits.append(
                f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),"
                f" {plane}) >= 0 THEN '1' ELSE '0' END"
            )
        return "concat(" + ", ".join(bits) + ")"

    keyed = "\n        UNION ALL ".join(
        f"SELECT vec_id AS id, {t} AS tbl, {bkt(t)} AS bkt FROM vecs"
        for t in range(n_tables)
    )
    return f"""
    WITH vecs AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE isfinite(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[])))
    ),
    keyed AS (
        {keyed}
    ),
    cands AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM keyed a JOIN keyed b
          ON a.tbl = b.tbl AND a.bkt = b.bkt AND a.id < b.id
    )
    SELECT id_a, id_b, {_COS} AS cosine
    FROM cands
    JOIN embeddings a ON a.vec_id = cands.id_a
    JOIN embeddings b ON b.vec_id = cands.id_b
    WHERE {_COS} >= {threshold}
    """


@query("sim_lsh_ann_pairs", sql=_lsh_sql())
def sim_lsh_ann_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine-threshold pairs via random-hyperplane LSH
    (4 tables × 8 planes): candidates collide in ≥1 bucket, exact cosine
    verifies. tests/test_similarity.py additionally asserts the result is
    a subset of the exact answer with useful recall."""
    t = load_tables(spark, sf_dir)
    return lsh_bucketed_pairs(t.embeddings, dim=_DIM, threshold=0.4)


@query(
    "sim_knn_classify",
    sql=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
               {_cos_sql('q.embedding', 'c.embedding')} AS cosine
        FROM embeddings q
        JOIN embeddings c ON c.vec_id % 23 != 0 AND c.label IS NOT NULL
        WHERE q.vec_id % 23 = 0
    ),
    topk AS (
        SELECT query_id, label FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
            ) AS rn FROM scored WHERE cosine IS NOT NULL
        ) WHERE rn <= 5
    ),
    votes AS (
        SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS n_votes
        FROM topk GROUP BY query_id, label
    )
    SELECT query_id AS vec_id, label AS predicted_label, n_votes FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY n_votes DESC, label
        ) AS rn FROM votes
    ) WHERE rn = 1
    """,
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction (k=5) for probe vectors (vec_id % 23 = 0)
    against the labeled remainder: majority label of the top-5 cosine
    neighbors, ties to the smaller label. Probes broadcast over the
    corpus; the vote is an aggregate of the tiny neighbor frame.
    NULL-labeled rows never enter the search (operator contract — an
    unlabeled example cannot vote); the oracle filters them in the
    scored CTE to state the same semantics."""
    from land_registry_data_ingestion_spark.operators.similarity import (
        knn_classify,
    )

    t = load_tables(spark, sf_dir)
    probes = t.embeddings.filter(F.col("vec_id") % 23 == 0)
    corpus = t.embeddings.filter(F.col("vec_id") % 23 != 0)
    return knn_classify(corpus, probes, k=5)


@query(
    "dedup_semantic",
    sql=f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 64
    ),
    assign AS (
        SELECT vec_id, embedding, cid AS centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY COALESCE({_cos_sql('e.embedding', 'c.cvec')}, -2.0) DESC, c.cid ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM assign a JOIN assign b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.4
    )
    SELECT a.vec_id, a.centroid_id,
           (d.vec_id IS NOT NULL) AS is_duplicate
    FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster the embedding space (Arrow
    map-only assignment, deterministic seeded centroids), then mark any
    vector with cosine ≥ 0.4 to a lower-id vector in the SAME cluster as
    a semantic duplicate. Cluster scoping keeps the quadratic term
    per-cluster — the corpus-wide pair space is never enumerated."""
    from land_registry_data_ingestion_spark.operators.similarity import (
        semantic_dedup,
    )

    t = load_tables(spark, sf_dir)
    return semantic_dedup(t.embeddings, n_clusters=64, threshold=0.4)


def _pq_sql(m: int = 8, n_codes: int = 16, sub: int = 8, k: int = 10) -> str:
    """DuckDB replay of deterministic PQ + ADC search: seeded codebooks
    (first n_codes ids' sub-vectors), per-subspace encode by rounded L2
    argmin (ties to the smaller code), query distance tables, approximate
    distance = sum of m table lookups."""
    subspaces = ", ".join(f"({s})" for s in range(m))
    def d2(x_lo, c): return (
        f"ROUND(list_dot_product({x_lo}, {x_lo})"
        f" - 2 * list_dot_product({x_lo}, {c})"
        f" + list_dot_product({c}, {c}), 6)"
    )
    x_sub = f"CAST(e.embedding[s.s*{sub}+1 : s.s*{sub}+{sub}] AS DOUBLE[])"
    q_sub = f"CAST(q.embedding[s.s*{sub}+1 : s.s*{sub}+{sub}] AS DOUBLE[])"
    c_sub = "b.cvec"
    # degenerate-vector contract (matches pq_topk/pq_codebooks): a vector
    # with a non-finite component (⇔ non-finite self-dot) never seeds a
    # codebook, never encodes, never ranks; zero vectors are valid L2
    # citizens. Applied as an isfinite(self-dot) filter on every
    # embeddings scan.
    fin = (
        "isfinite(list_dot_product(CAST({t}.embedding AS DOUBLE[]),"
        " CAST({t}.embedding AS DOUBLE[])))"
    )
    return f"""
    WITH subs(s) AS (VALUES {subspaces}),
    books AS (
        SELECT s.s, c.code, CAST(c.embedding[s.s*{sub}+1 : s.s*{sub}+{sub}]
               AS DOUBLE[]) AS cvec
        FROM (
            SELECT embedding, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                   AS INT) AS code
            FROM (SELECT * FROM embeddings e WHERE {fin.format(t='e')}
                  ORDER BY vec_id LIMIT {n_codes})
        ) c CROSS JOIN subs s
    ),
    encoded AS (
        SELECT vec_id, s, code FROM (
            SELECT e.vec_id, s.s, b.code,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id, s.s
                       ORDER BY {d2(x_sub, c_sub)} ASC, b.code ASC
                   ) AS rn
            FROM embeddings e CROSS JOIN subs s
            JOIN books b ON b.s = s.s
            WHERE {fin.format(t='e')}
        ) WHERE rn = 1
    ),
    dtab AS (
        SELECT q.vec_id AS query_id, s.s, b.code,
               {d2(q_sub, c_sub)} AS dt
        FROM embeddings q CROSS JOIN subs s
        JOIN books b ON b.s = s.s
        WHERE q.vec_id < 10 AND {fin.format(t='q')}
    ),
    scored AS (
        SELECT d.query_id, enc.vec_id AS neighbor_id,
               ROUND(SUM(d.dt), 6) AS approx_d2
        FROM encoded enc
        JOIN dtab d ON d.s = enc.s AND d.code = enc.code
        WHERE enc.vec_id != d.query_id
        GROUP BY d.query_id, enc.vec_id
    )
    SELECT query_id, neighbor_id, approx_d2, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY approx_d2 ASC, neighbor_id ASC
        ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@query("sim_pq_topk", sql=_pq_sql())
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-10 (asymmetric distance): the corpus
    compresses to 8 one-byte codes per vector (map-only encode, seeded
    per-subspace codebooks), queries keep full precision and score a
    neighbor with 8 distance-table lookups — the memory-bound ANN path
    (32x compression) that IVF composes with at cluster scale. Oracle
    replays the identical quantizer, codes and tables."""
    from land_registry_data_ingestion_spark.operators.similarity import pq_topk

    t = load_tables(spark, sf_dir)
    probes = t.embeddings.filter(F.col("vec_id") < 10)
    return pq_topk(t.embeddings, probes, m=8, n_codes=16, k=10)


_RRF_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_RRF_TOKS = f"string_split_regex({_RRF_NORM}, '\\s+')"
# whitespace-normalized count — mirrors functions/text.py::token_count
_RRF_WSNORM = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
_RRF_NTOK = (
    f"CAST(CASE WHEN {_RRF_WSNORM} = '' THEN 0"
    f" ELSE len(string_split_regex({_RRF_WSNORM}, '\\s+')) END AS BIGINT)"
)


@query(
    "sim_hybrid_rrf",
    sql=f"""
    WITH tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest({_RRF_TOKS}) AS term FROM documents)
        WHERE term IN ('merge', 'spark', 'window')
        GROUP BY doc_id, term
    ),
    dfreq AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t FROM tf GROUP BY term
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG({_RRF_NTOK}) AS avgdl
        FROM documents
    ),
    dl AS (SELECT doc_id, {_RRF_NTOK} AS dl FROM documents),
    bm AS (
        SELECT tf.doc_id,
               ROUND(SUM(
                   ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl))
               ), 6) AS bm25
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        JOIN dl ON tf.doc_id = dl.doc_id
        GROUP BY tf.doc_id
    ),
    lex AS (
        SELECT doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank_a
        FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50
    ),
    sem AS (
        SELECT doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY cosine DESC, doc_id) AS BIGINT) AS rank_b
        FROM (
            SELECT c.vec_id AS doc_id, {_COS.replace("a.embedding", "q.embedding").replace("b.embedding", "c.embedding")} AS cosine
            FROM embeddings c JOIN embeddings q
              ON q.vec_id = 0 AND c.vec_id != 0
        ) WHERE cosine IS NOT NULL ORDER BY cosine DESC, doc_id LIMIT 50
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.rank_a, s.rank_b,
               ROUND(COALESCE(1.0 / (60 + l.rank_a), 0)
                     + COALESCE(1.0 / (60 + s.rank_b), 0), 6) AS rrf
        FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    )
    SELECT doc_id, rank_a, rank_b, rrf,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
               AS fused_rank
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 20
    """,
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 for the bag {merge, spark, window}
    fused with the exact cosine top-50 around probe vector 0 (doc ids and
    vec ids are aligned in the corpus) by reciprocal-rank fusion
    (score = Σ 1/(60+rank)). Each leg is produced by its scale-path
    operator (term-pruned BM25, broadcast-probe top-k); the fusion itself
    joins two 50-row frames — driver-scale at any corpus size."""
    from land_registry_data_ingestion_spark.operators.corpus import (
        bm25_search,
        rrf_fuse,
    )

    t = load_tables(spark, sf_dir)
    lex = bm25_search(t.documents, ["merge", "spark", "window"], top_n=50)
    probe = t.embeddings.filter(F.col("vec_id") == 0)
    sem = brute_force_topk(t.embeddings, probe, k=50).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse(lex, sem, id_col="doc_id", top_n=20)


@query(
    "sim_kmeans_clusters",
    sql=f"""
    WITH c AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    d AS (
        SELECT e.vec_id, c.cid,
               {_cos_sql('e.embedding', 'c.cvec')} AS cos
        FROM embeddings e CROSS JOIN c
    ),
    a AS (
        SELECT vec_id, cid, cos, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY COALESCE(cos, -2.0) DESC, cid ASC
        ) AS rn
        FROM d
    )
    SELECT cid AS centroid_id,
           CAST(count(*) AS BIGINT) AS n_members,
           ROUND(AVG(cos), 6) AS avg_cos
    FROM a WHERE rn = 1
    GROUP BY cid
    """,
)
def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means cluster profile (k = 8, deterministic smallest-id
    seeds): every vector is assigned to its max-cosine centroid (ties to
    the smallest centroid id) and each cluster reports its size and mean
    member-to-centroid cosine. Assignment and scoring run on the Arrow
    fast path (``ivf_assign_vectorized`` — centroids collected, small by
    construction, corpus streamed map-only), so the corpus never shuffles
    until the k-row final aggregate; cluster scale is O(n·k) work with
    zero joins on the corpus side. Seeds can be refined with
    ``refine_centroids`` / ``kmeans_parallel_init`` (recall-tested flags
    of the IVF index); the declared query keeps the RNG-free seeding so a
    second engine rebuilds the identical clustering."""
    from land_registry_data_ingestion_spark.operators.similarity import (
        ivf_assign_vectorized,
        seed_centroids,
    )

    t = load_tables(spark, sf_dir)
    cent = seed_centroids(t.embeddings, n_centroids=8)
    # assignment and member-to-centroid cosine in ONE Arrow pass — the
    # kernel already holds the (n, k) cosine matrix, so emitting the
    # winning score avoids a broadcast join + second scoring pass.
    scored = ivf_assign_vectorized(
        t.embeddings.select("vec_id", "embedding"), cent, score_col="cos"
    )
    return scored.groupBy("centroid_id").agg(
        F.count("*").alias("n_members"),
        F.round(F.avg("cos"), 6).alias("avg_cos"),
    )


_BRUTE_IDS_SQL = f"""
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_cos_sql('q.embedding', 'c.embedding')} DESC,
                            c.vec_id
               ) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 10
          AND {_cos_sql('q.embedding', 'c.embedding')} IS NOT NULL
    ) WHERE rank <= 10
"""


@query(
    "sim_ivf_recall",
    sql=f"""
    WITH ivf AS ({_ivf_sql()}),
    ex AS ({_BRUTE_IDS_SQL}),
    matched AS (
        SELECT ex.query_id, COUNT(ivf.neighbor_id) AS n_hit
        FROM ex LEFT JOIN ivf
          ON ex.query_id = ivf.query_id
         AND ex.neighbor_id = ivf.neighbor_id
        GROUP BY ex.query_id
    )
    SELECT query_id, CAST(n_hit AS BIGINT) AS n_overlap,
           ROUND(n_hit / 10.0, 4) AS recall_at_10
    FROM matched
    """,
)
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN self-evaluation: recall@10 of the IVF index against the exact
    brute-force neighbors, per query — the quality dial (nprobe/n_lists)
    a production ANN deployment tunes against, computed by the engine
    itself. Both legs are the existing scale-path operators; the metric
    join touches only (query_id, neighbor_id) pairs — driver-scale at
    any corpus size."""
    from land_registry_data_ingestion_spark.util import barrier

    t = load_tables(spark, sf_dir)
    qs = t.embeddings.filter(F.col("vec_id") < 10)
    ivf = ivf_topk(t.embeddings, qs, n_centroids=16, nprobe=4, k=10).select(
        "query_id", "neighbor_id"
    )
    # barrier: the exact leg feeds both the overlap semi-join and the
    # per-query spine — unbarriered, the full brute-force corpus sweep
    # runs twice.
    ex = barrier(
        brute_force_topk(t.embeddings, qs, k=10).select(
            "query_id", "neighbor_id"
        )
    )
    matched = (
        ex.join(ivf, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("_hit"))
    )
    return (
        ex.select("query_id")
        .distinct()
        .join(matched, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("_hit", F.lit(0)).cast("long").alias("n_overlap"),
            F.round(F.coalesce("_hit", F.lit(0)) / 10.0, 4).alias(
                "recall_at_10"
            ),
        )
    )
