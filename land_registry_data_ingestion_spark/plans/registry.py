"""Query registry backing ``__spark_entry__.py``.

Each query is a named, oracle-checked statement of one operator from
SURVEY.md §2 (or a scale-out extension), expressed twice:

- ``fn(spark, sf_dir) -> DataFrame`` — the engine's Spark-first plan;
- ``sql`` — the equivalent ANSI SQL DuckDB runs on the same parquet views.

Contract (driver's CORRECTNESS gate): column names must match exactly
between the two, values hash-compare order-insensitively. Computed columns
are therefore aliased identically on both sides, float outputs are rounded
at a fixed scale on both sides, and every top-k/limit query has a
deterministic total order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # None → non-SQL-expressible; driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, sql: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def fresh(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The registry serves long-lived sessions that run ~50 queries
            # back to back: drop the previous query's barrier caches (see
            # util.barrier) before building this one, so cached
            # intermediates never accumulate across queries.
            from land_registry_data_ingestion_spark.util import release_caches

            release_caches()
            return fn(spark, sf_dir)

        fresh.__name__ = fn.__name__
        fresh.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(name=name, fn=fresh, sql=sql, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}


_LOADED = False

# The external correctness harness samples a bounded prefix (~50) of the
# registry in insertion order, so ordering is part of the verification
# contract: queries that have not yet earned an external green row are
# listed first, round-robin'ing the remainder across rounds so every
# declared query lands inside the window on some round. Names absent from
# the registry are ignored; registered queries missing from this list are
# appended in module-load order.
_CHECK_PRIORITY: tuple[str, ...] = (
    # Round 5 front-of-window. First: the queries whose PLAN changed this
    # round — their hashes must be re-pinned by a fresh driver row, not
    # only the repo oracle. (text_pipeline_pack: fused token-count path;
    # text_dup_span_trim: bound hash array in the shared barrier;
    # dedup_near_dup_groups: one-exchange propagation rounds + window
    # sizes; evt_type_pagerank: chained barriers, one event-log pass.)
    "text_pipeline_pack",
    "text_dup_span_trim",
    "dedup_near_dup_groups",
    "evt_type_pagerank",
    # Next: the round-robin remainder whose newest external row is
    # r2-era — the oldest green rows in the ledger (round-4 checked the
    # then-never-checked + all round-4-touched plans; the blocks below
    # were last externally driven in round 2).
    "evt_conflate_latest",
    "evt_hourly_window",
    "evt_json_extract",
    "evt_sessionize",
    "sim_cosine_pairs",
    "sim_topk_bruteforce",
    "sim_ivf_topk",
    "sim_lsh_ann_pairs",
    "q1_delay_histogram_days",
    "q1_delay_histogram_weeks",
    "q2_interval_binning",
    "q3_inverse_volume_weights",
    "q4_normalized_delay",
    "q5_smoothed_delay",
    "rel_project_filter",
    "rel_anti_join",
    "rel_semi_join",
    "rel_inner_join_agg",
    "rel_left_join_broadcast",
    "rel_full_outer_reconcile",
    "agg_scalar_max",
    "agg_count_distinct",
    "agg_group_count",
    "agg_multi",
    "agg_dup_detect",
    "win_row_number",
    "win_rolling_mean",
    "win_latest_row",
    "win_lag_delta",
    "ord_sort_limit",
    "ord_union",
    "ord_except",
    "f_sha256",
    "f_datetime_parts",
    "f_working_day_calendar",
    "cdc_rewind_versions",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "text_token_count",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "text_gopher_filters",
    "text_redact_pii",
    "text_hash_split",
    "text_vocabulary",
    "text_curate_corpus",
    "agg_exact_quantiles",
    "agg_rollup",
    "rel_profile_table",
    # Round-3 external rows (freshest) — back of the rotation.
    "sim_knn_classify",
    "evt_asof_join",
    "evt_funnel",
    "evt_retention",
    "evt_anomaly_zscore",
    "mm_feature_extract",
    "text_stratified_sample",
    "text_pack_sequences",
    "text_tfidf_topterms",
    "text_bm25_search",
    "text_lm_perplexity",
    "cdc_scd2_history",
    "agg_topk_per_group",
    "agg_kmv_distinct",
    "evt_gap_fill",
    "evt_ewma",
    "text_weighted_sample",
    "text_edit_distance_pairs",
    "win_distribution",
    "rel_pivot_wide",
    "text_temperature_mixing",
    "cdc_state_as_of",
    "sim_hybrid_rrf",
    "text_dsir_weights",
    "evt_range_join",
    "evt_rolling_24h",
    "sim_kmeans_clusters",
    "text_token_budget_sample",
    "mm_metadata_stats",
    "cdc_incremental_rollup",
    "rel_skew_join_salted",
    "evt_ohlc_hourly",
    "rel_multi_join_chain",
    "text_curriculum_shards",
    # Round-4 external rows (freshest) — very back of the rotation.
    "agg_kmv_by_group",
    "sim_ivf_recall",
    "evt_type_correlation",
    "text_corpus_report",
    "evt_user_entropy",
    "mm_frame_sample",
    "win_running_total",
    "ord_intersect",
    "cdc_merge_state",
    "cdc_merge_outcomes",
    "cdc_merge_ledger",
    "text_repetition_filters",
    "text_segment_dedup",
    "text_decontaminate",
    "sim_pq_topk",
    "dedup_semantic",
    "evt_graph_triangles",
    "text_dup_spans",
    "win_equidepth_histogram",
    "evt_sliding_users_24h",
)


def _load_all() -> None:
    """Import every query module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from land_registry_data_ingestion_spark.plans import (  # noqa: F401
        analytics,
        relational,
        merge_queries,
        textops_queries,
        dedup_queries,
        similarity_queries,
        events_queries,
        multimodal_queries,
        corpus_queries,
    )

    ordered = {n: REGISTRY[n] for n in _CHECK_PRIORITY if n in REGISTRY}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _LOADED = True
