"""Relational core queries (SURVEY §2.2-§2.7): projections, predicates,
joins, aggregates, windows, sorts/limits/set ops, scalar functions.

Each query is the declared, oracle-checked form of one operator family.
The Spark side stays fully declarative so Catalyst handles pushdown,
pruning, and join strategy; comments note the expected physical shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from land_registry_data_ingestion_spark.functions.datetime_fns import (
    nth_working_day_of_month,
)
from land_registry_data_ingestion_spark.operators.reconcile import reconcile
from land_registry_data_ingestion_spark.operators.rewind import number_versions
from land_registry_data_ingestion_spark.plans.registry import query
from land_registry_data_ingestion_spark.sources.parquet import load_tables


# --- P1-P3: projection + predicates (filters reach the parquet scan) -------


@query(
    "rel_project_filter",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 30 AND l_extendedprice < 10000 AND l_returnflag = 'R'
    """,
)
def rel_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3: projection with equality and range predicates. The plan
    must show PushedFilters + a 5-column ReadSchema."""
    t = load_tables(spark, sf_dir)
    return t.lineitem.filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_extendedprice") < 10000)
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# --- J-family joins ---------------------------------------------------------


@query(
    "rel_anti_join",
    sql="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/J5: customers with no urgent orders (left_anti replaces the
    reference's driver-side ``isin`` sets, inspect_database.py:35-58).
    The urgency predicate keeps the result non-empty on the referentially
    dense test data — a 0-row anti-join would verify nothing."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
                "o_custkey"
            ),
            t.customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "rel_semi_join",
    sql="""
    SELECT n.n_name, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY n.n_name
    """,
)
def rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: customers having ≥1 urgent order (left_semi), rolled up by
    nation. Nation is tiny → broadcast side."""
    t = load_tables(spark, sf_dir)
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        t.customer.join(urgent, t.customer.c_custkey == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "rel_inner_join_agg",
    sql="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total_revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def rel_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: inner equi join on the business key + group aggregate."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        )
    )


@query(
    "rel_left_join_broadcast",
    sql="""
    SELECT p.p_brand,
           COUNT(*) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def rel_left_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left join with an explicitly broadcast dimension — the fact side
    never shuffles for the join (only for the final small agg)."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.join(
            F.broadcast(t.part), t.lineitem.l_partkey == t.part.p_partkey, "left"
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "rel_full_outer_reconcile",
    sql="""
    WITH base AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END
                 AS o_custkey,
               o_totalprice
        FROM orders
    ),
    l AS (SELECT * FROM base WHERE o_orderkey % 5 != 0),
    r AS (SELECT * FROM base WHERE o_orderkey % 7 != 0)
    SELECT CASE
             WHEN l.o_orderkey IS NOT NULL AND r.o_orderkey IS NOT NULL THEN 'both'
             WHEN l.o_orderkey IS NOT NULL THEN 'left_only'
             ELSE 'right_only'
           END AS presence,
           COUNT(*) AS n_rows
    FROM l FULL OUTER JOIN r
      ON l.o_orderkey IS NOT DISTINCT FROM r.o_orderkey
     AND l.o_custkey IS NOT DISTINCT FROM r.o_custkey
     AND l.o_totalprice IS NOT DISTINCT FROM r.o_totalprice
    GROUP BY 1
    """,
)
def rel_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/Q6: full-outer reconciliation with provenance indicator over two
    deterministic slices of orders (database_verify.py:209-236). NULLs are
    planted in o_custkey (o_orderkey % 11 = 0) to pin the pandas-merge
    semantics: rows equal-except-for-a-shared-NULL must count as 'both'
    (null-safe join), not left_only + right_only."""
    t = load_tables(spark, sf_dir)
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    base = t.orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_totalprice",
    )
    left = base.filter(F.col("o_orderkey") % 5 != 0)
    right = base.filter(F.col("o_orderkey") % 7 != 0)
    return reconcile(left, right, on=cols).counts.select("presence", "n_rows")


# --- A-family aggregates ----------------------------------------------------


@query(
    "agg_scalar_max",
    sql="""
    SELECT MAX(o_orderdate) AS max_orderdate,
           MAX(o_totalprice) AS max_totalprice,
           COUNT(*) AS n_rows
    FROM orders
    """,
)
def agg_scalar_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2: scalar max / count(*) — the downloader's
    max(transaction_date) datestamp probe (pp_complete_downloader.py:432-439)."""
    t = load_tables(spark, sf_dir)
    return t.orders.agg(
        F.max("o_orderdate").alias("max_orderdate"),
        F.max("o_totalprice").alias("max_totalprice"),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_count_distinct",
    sql="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_order_dates
    FROM orders
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact distinct counts (approx_count_distinct is the documented
    scale path; exact keeps the oracle comparable)."""
    t = load_tables(spark, sf_dir)
    return t.orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.to_date("o_orderdate")).alias("n_order_dates"),
    )


@query(
    "agg_group_count",
    sql="""
    SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type
    """,
)
def agg_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: frequency table (value_counts)."""
    t = load_tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(F.count("*").alias("n_events"))


@query(
    "agg_multi",
    sql="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: multi-aggregate group-by (TPC-H Q1 shape) — partial aggregation
    map-side, one shuffle on the tiny group key."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_dup_detect",
    sql="""
    SELECT COUNT(*) AS n_dup_keys, MAX(n_rows) AS max_rows_per_key
    FROM (
        SELECT l_orderkey, COUNT(*) AS n_rows FROM lineitem
        GROUP BY l_orderkey HAVING COUNT(*) > 1
    )
    """,
)
def agg_dup_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: duplicate-key invariant probe (value_counts().max()==1 check,
    rewind notebook cells 13-14)."""
    t = load_tables(spark, sf_dir)
    dups = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )
    return dups.agg(
        F.count("*").alias("n_dup_keys"), F.max("n_rows").alias("max_rows_per_key")
    )


# --- W-family windows -------------------------------------------------------


@query(
    "win_row_number",
    sql="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) - 1 AS BIGINT) AS version
    FROM orders WHERE o_custkey < 100
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: per-key version ordinal (cumcount) — deterministic tiebreak on
    the key so the oracle ranks identically."""
    t = load_tables(spark, sf_dir)
    small = t.orders.filter(F.col("o_custkey") < 100)
    return number_versions(
        small, "o_custkey", ["o_orderdate", "o_orderkey"], "version"
    ).select(
        "o_custkey",
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
    )


@query(
    "win_latest_row",
    sql="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def win_latest_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: latest-row-per-key selection (the archive-log "previous hash"
    lookup, pp_complete_data_decision.py:135-153)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        t.orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_totalprice").alias("latest_price"),
        )
    )


@query(
    "win_lag_delta",
    sql="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice - LAG(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ), 2) AS price_delta
    FROM orders WHERE o_custkey < 200
    """,
)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: previous-version lookup via lag."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t.orders.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
            ).alias("price_delta"),
        )
    )


@query(
    "win_rolling_mean",
    sql="""
    WITH daily AS (
        SELECT CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT order_date,
           ROUND(AVG(n_orders) OVER (
               ORDER BY order_date ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
           ), 6) AS smoothed_n
    FROM daily
    """,
)
def win_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: 7-row centered rolling mean over daily volume. Positional
    (rowsBetween) — the reference's pandas.rolling(7, center=True)."""
    t = load_tables(spark, sf_dir)
    daily = (
        t.orders.select(
            F.to_date("o_orderdate").cast("timestamp").alias("order_date")
        )
        .groupBy("order_date")
        .agg(F.count("*").alias("n_orders"))
    )
    w = Window.orderBy("order_date").rowsBetween(-3, 3)
    return daily.select(
        "order_date", F.round(F.avg("n_orders").over(w), 6).alias("smoothed_n")
    )


# --- O-family: sorts / limits / set ops -------------------------------------


@query(
    "ord_sort_limit",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def ord_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: global top-k — TakeOrderedAndProject (per-partition heap +
    driver merge, no global sort materialized). Deterministic tiebreak."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@query(
    "ord_union",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n_rows FROM (
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    ) GROUP BY o_orderstatus
    """,
)
def ord_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: unionByName of two slices (pandas.concat) then aggregate."""
    t = load_tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_orderstatus"
    )
    b = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus"
    )
    return a.unionByName(b).groupBy("o_orderstatus").agg(F.count("*").alias("n_rows"))


@query(
    "ord_except",
    sql="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def ord_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: set difference on the key column (both-direction id diff,
    inspect_database.py:35-58) — keys minus urgent-order keys, non-empty
    on the referentially dense test data."""
    t = load_tables(spark, sf_dir)
    return t.customer.select("c_custkey").exceptAll(
        t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    ).distinct()


# --- F-family scalar functions ----------------------------------------------


@query(
    "f_sha256",
    sql="""
    SELECT doc_id, sha256(text) AS text_sha256 FROM documents WHERE doc_id < 100
    """,
)
def f_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: SHA-256 content hash (file-dedup primitive,
    pp_complete_downloader.py:619-628) as a columnar expression."""
    t = load_tables(spark, sf_dir)
    return t.documents.filter(F.col("doc_id") < 100).select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha256")
    )


@query(
    "f_datetime_parts",
    sql="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1, 2, 3
    """,
)
def f_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F9/F10: date construction, truncation, last-day-of-month."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        )
        .groupBy("order_year", "order_month", "month_end")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "f_working_day_calendar",
    sql="""
    WITH months AS (
        SELECT DISTINCT CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        FROM orders
    )
    SELECT CAST(m AS TIMESTAMP) AS month_start,
           CAST(list_filter(
                    generate_series(m, last_day(m), INTERVAL 1 DAY),
                    d -> isodow(d) <= 5
                )[20] AS TIMESTAMP) AS publish_day
    FROM months
    """,
)
def f_working_day_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6: the publish calendar — 20th working day of every month in the
    data, computed as a native sequence/filter/element_at expression
    (reference lib_datetime.py:14-40 iterates weekdays in Python)."""
    t = load_tables(spark, sf_dir)
    months = t.orders.select(
        F.trunc("o_orderdate", "month").alias("m")
    ).distinct()
    return months.select(
        F.col("m").cast("timestamp").alias("month_start"),
        nth_working_day_of_month(F.col("m"), 20)
        .cast("timestamp")
        .alias("publish_day"),
    )


@query(
    "agg_rollup",
    sql="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS lvl,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    -- Declared contract (empty-tier adversarial gate, round 9): Spark
    -- emits NO super-aggregate rows over an empty relation (its grouping
    -- sets expand before aggregation), while DuckDB emits the ANSI
    -- grand-total row with COUNT 0. A COUNT(*)=0 group can only be that
    -- phantom row — every group Spark produces has at least one row —
    -- so this HAVING encodes "no rows, no rollup" exactly.
    HAVING COUNT(*) > 0
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation in one pass: ROLLUP(status, priority)
    produces leaf, per-status, and grand-total rows from a single
    shuffle (Spark expands grouping sets map-side; no re-scan per
    level). GROUPING() flags disambiguate genuine NULL keys from
    subtotal rows.

    Empty-input contract: Spark produces no super-aggregate rows over an
    empty relation (grouping-set expansion happens before aggregation,
    so there is no group to aggregate), diverging from ANSI/DuckDB's
    COUNT-0 grand-total row; the oracle declares Spark's semantics via
    HAVING COUNT(*) > 0."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            )
            .cast("long")
            .alias("lvl"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "lvl",
            "n_orders",
            "sum_price",
        )
    )


@query(
    "agg_exact_quantiles",
    sql="""
    WITH qs AS (
        SELECT o_orderstatus,
               quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.9]) AS q
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 0.25 AS pct, ROUND(q[1], 4) AS val FROM qs
    UNION ALL SELECT o_orderstatus, 0.5, ROUND(q[2], 4) FROM qs
    UNION ALL SELECT o_orderstatus, 0.75, ROUND(q[3], 4) FROM qs
    UNION ALL SELECT o_orderstatus, 0.9, ROUND(q[4], 4) FROM qs
    """,
)
def agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles via the distributed sort-rank-interpolate
    operator (``grouped_exact_quantiles``) — bit-equal to DuckDB
    ``quantile_cont`` (type-7 interpolation) without the built-in
    ``percentile`` aggregate's buffer-every-value state."""
    from land_registry_data_ingestion_spark.operators.binning import (
        grouped_exact_quantiles,
    )

    t = load_tables(spark, sf_dir)
    q = grouped_exact_quantiles(
        t.orders, ["o_orderstatus"], "o_totalprice", [0.25, 0.5, 0.75, 0.9]
    )
    return q.select("o_orderstatus", "pct", F.round("val", 4).alias("val"))


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@query(
    "rel_profile_table",
    sql="\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def rel_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (ANALYZE-style data quality stats): per-column row,
    null and exact distinct counts in ONE scan.

    The multi-column ``count_distinct`` aggregate plans as a single
    Expand + hash-aggregate — columns× row inflation, but one pass over
    the table and partial aggregation before the shuffle; the per-column
    UNION the oracle states would scan the table columns× times. The
    profile row is then unpivoted driver-free via ``stack``."""
    t = load_tables(spark, sf_dir)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"nd_{c}"))
    one = t.orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


@query(
    "rel_skew_join_salted",
    sql="""
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_items,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def rel_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension revenue rollup through ``salted_join``: the big
    side's rows carry a deterministic salt, the dimension is replicated
    per salt, and the join key becomes (key, salt) — one hot part key
    spreads over n_salts reducers instead of melting one task. The
    logical result is identical to the plain join (this oracle proves it
    on real tables; `test_skew_bucketing.py` proves the hot-key fan-out),
    which is exactly the property that makes salting safe to deploy
    reactively at 100 TB when AQE's partition-level splitting isn't
    enough for a single pathological key."""
    from land_registry_data_ingestion_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir)
    big = t.lineitem.select(
        F.col("l_partkey").alias("p_partkey"),
        "l_extendedprice",
        "l_discount",
    )
    dim = t.part.select("p_partkey", "p_brand")
    joined = salted_join(big, dim, on=["p_partkey"], n_salts=8)
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@query(
    "agg_topk_per_group",
    sql="""
    SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS INTEGER) AS rnk
        FROM orders
    ) WHERE rnk <= 3
    """,
)
def agg_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each priority class — the "best rows
    per category" retrieval every report layer needs.

    The oracle states the classic single-window form; the declared plan is
    :func:`...operators.topk.topk_per_group` — a salted two-phase window —
    because ``o_orderpriority`` has FIVE values: one window over it
    funnels the entire fact table through 5 reducers, which is exactly the
    plan that dies at 100 TB. Phase 1 ranks within (priority, salt-of-key)
    across ``5 × 32`` partitions and keeps ≤3 rows each; phase 2 re-ranks
    the ≤480 survivors. Provably lossless: a global top-3 row is top-3 in
    its own salt slice."""
    from land_registry_data_ingestion_spark.operators.topk import topk_per_group

    t = load_tables(spark, sf_dir)
    return topk_per_group(
        t.orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        group_cols=["o_orderpriority"],
        order_cols=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
        salt_col="o_orderkey",
        n_salts=32,
        rank_name="rnk",
    ).select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")


# KMV sketch parameters shared by the Spark plan and the SQL oracle.
_KMV_K = 256
_KMV_SALT = 7
_KMV_SCALE = float(2**60)


@query(
    "agg_kmv_distinct",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT ('0x' || substr(
            md5('{_KMV_SALT}|' || CAST(o_custkey AS VARCHAR)), 1, 15
        ))::BIGINT AS hv
        FROM orders
    ),
    k AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seen, MAX(hv) AS max_hv FROM k),
    x AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct
          FROM (SELECT DISTINCT o_custkey FROM orders))
    SELECT {_KMV_K} AS k,
           ROUND(CASE WHEN s.n_seen < {_KMV_K} THEN CAST(s.n_seen AS DOUBLE)
                 ELSE ({_KMV_K} - 1) / (CAST(s.max_hv AS DOUBLE) / {_KMV_SCALE!r})
                 END, 4) AS est_distinct,
           x.exact_distinct,
           ROUND(ABS(CASE WHEN s.n_seen < {_KMV_K} THEN CAST(s.n_seen AS DOUBLE)
                     ELSE ({_KMV_K} - 1) / (CAST(s.max_hv AS DOUBLE) / {_KMV_SCALE!r})
                     END - x.exact_distinct) / x.exact_distinct, 4) AS rel_err
    FROM s CROSS JOIN x
    """,
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch over ``o_custkey``,
    checked against the exact count — the mergeable-sketch answer to
    COUNT(DISTINCT) when the exact shuffle is too expensive at 100 TB.

    The sketch keeps the k=256 smallest values of a 60-bit md5-derived
    hash; the estimator is ``(k-1)/u_k`` with ``u_k`` the k-th smallest
    hash as a fraction of the hash space (Bar-Yossef et al. 2002). Unlike
    ``approx_count_distinct`` (HLL++, whose register layout no second
    engine replays), every step here is engine-neutral arithmetic — the
    oracle recomputes the identical sketch in DuckDB and the hash compare
    proves it bit-for-bit. All post-hash floating point is IEEE
    correctly-rounded ops on identical inputs (int→double cast, division),
    so even the unrounded estimate matches exactly.

    Scale shape: the per-partition ``sort+limit k`` is Spark's
    TakeOrdered — each task keeps its own k smallest, only ``tasks × k``
    hashes reach the driver-side merge; the text/corpus never moves. The
    sketch is trivially mergeable across partitions/days (union + re-take
    k), which is the property that matters for incremental pipelines. At
    sf0.001 the sketch degenerates to n_seen < k and reports the exact
    count — the estimator's defined behaviour, asserted by the oracle."""
    from land_registry_data_ingestion_spark.operators.dedup import _md5_hash64

    t = load_tables(spark, sf_dir)
    hashes = (
        t.orders.select(
            _md5_hash64(F.col("o_custkey").cast("string"), _KMV_SALT).alias("hv")
        )
        .distinct()
    )
    topk = hashes.orderBy("hv").limit(_KMV_K)
    s = topk.agg(
        F.count("*").cast("long").alias("n_seen"), F.max("hv").alias("max_hv")
    )
    x = t.orders.agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_seen") < _KMV_K, F.col("n_seen").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        / (F.col("max_hv").cast("double") / F.lit(_KMV_SCALE))
    )
    return (
        s.crossJoin(F.broadcast(x))
        .select(
            F.lit(_KMV_K).alias("k"),
            F.round(est, 4).alias("est_distinct"),
            "exact_distinct",
            # try_divide: on an empty table exact_distinct is 0 — the
            # relative error is undefined (NULL, the oracle's /0 value),
            # not a query-killing ANSI error
            F.round(
                F.try_divide(
                    F.abs(est - F.col("exact_distinct")),
                    F.col("exact_distinct"),
                ),
                4,
            ).alias("rel_err"),
        )
    )


@query(
    "evt_ohlc_hourly",
    sql="""
    WITH e AS (
        -- hour bucket via epoch + interval arithmetic (NTZ-safe: no
        -- to_timestamp, which returns TIMESTAMPTZ and renders in the
        -- session zone), equal to date_trunc('hour') on every non-NULL
        -- ts: DuckDB 1.0's window PARTITION BY over date_trunc of a
        -- NULLABLE ts splits the NULL rows across partitions
        -- nondeterministically (validity-mask misfold; same root cause
        -- makes `date_trunc(ts) IS NULL` evaluate false on NULL ts),
        -- which yields several ra=1 rows in the NULL-hour group. The
        -- epoch form propagates NULL correctly.
        -- FLOOR division, not DuckDB's truncate-toward-zero `//`: a
        -- pre-epoch ts has negative epoch_us, where `//` rounds UP and
        -- buckets 1969-12-31 23:30 into 1970-01-01 00:00 while Spark's
        -- date_trunc (and ANSI) floor to 23:00 (timeedge tier, round
        -- 9). The CASE subtracts 1 exactly when the remainder is
        -- negative; NULL ts propagates through both operands to NULL.
        SELECT event_type,
               TIMESTAMP '1970-01-01'
                 + (epoch_us(ts) // 3600000000
                    - CASE WHEN epoch_us(ts) % 3600000000 < 0
                           THEN 1 ELSE 0 END) * INTERVAL 1 HOUR AS hour,
               ts, event_id, value
        FROM events
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, hour
                                  ORDER BY ts, event_id) AS ra,
               ROW_NUMBER() OVER (PARTITION BY event_type, hour
                                  ORDER BY ts DESC, event_id DESC) AS rd
        FROM e
    )
    SELECT event_type, hour,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM r GROUP BY event_type, hour
    """,
)
def evt_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-high-low-close time-series rollup per (event_type, hour) —
    the market-data shape of a tumbling-window aggregate. Open/close are
    ``min_by``/``max_by`` on the (ts, event_id) struct (total order, so
    same-second ties resolve identically in both engines), making the
    whole thing ONE hash aggregate with map-side combine — no window
    function, no second shuffle. The oracle reaches the same rows via
    row-numbered first/last, the classic SQL spelling."""
    t = load_tables(spark, sf_dir)
    ord_key = F.struct("ts", "event_id")
    return (
        t.events.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("event_type", "hour")
        .agg(
            F.min_by("value", ord_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ord_key).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "win_distribution",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window distribution functions — percent_rank, cume_dist, ntile —
    of order value within each priority class (the percentile-position
    complement to the W-family's row_number/lag/rolling windows).

    All three share ONE window spec, so Catalyst evaluates them in a
    single Window operator over one exchange+sort. The (value, key)
    ordering is a total order → deterministic ntile assignment in both
    engines. Scale note: distribution functions are rank-complete by
    definition — every row's output depends on its whole group — so the
    per-group sort is inherent to the semantics (unlike top-k, which
    ``operators/topk.py`` de-funnels); with few groups at very large
    scale the move is approximate quantiles or the exact distributed
    quantile operator (``binning.py::grouped_exact_quantiles``) over the
    value histogram instead of per-row positions."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "rel_pivot_wide",
    sql="""
    SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS price_f,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS price_o,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS price_p
    FROM orders GROUP BY 1
    """,
)
def rel_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-year order counts and price totals spread
    across status columns. Declared with the explicit value list
    (``pivot("o_orderstatus", [...])``) — Spark then plans ONE hash
    aggregate with conditional sums (PivotFirst), identical shape to the
    oracle's CASE battery, with map-side combine; omitting the list would
    add a blocking distinct scan to discover values, which is the
    difference between one pass and two at 100 TB."""
    t = load_tables(spark, sf_dir)
    piv = (
        t.orders.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            "o_orderstatus",
            "o_totalprice",
        )
        .groupBy("yr")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("price"),
        )
    )
    return piv.select(
        "yr",
        F.coalesce(F.col("F_n"), F.lit(0)).cast("long").alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).cast("long").alias("n_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).cast("long").alias("n_p"),
        F.coalesce(F.col("F_price"), F.lit(0.0)).alias("price_f"),
        F.coalesce(F.col("O_price"), F.lit(0.0)).alias("price_o"),
        F.coalesce(F.col("P_price"), F.lit(0.0)).alias("price_p"),
    )


@query(
    "win_equidepth_histogram",
    sql="""
    WITH ranked AS (
      SELECT o_totalprice,
             rank() OVER (ORDER BY o_totalprice, o_orderkey) AS r,
             count(*) OVER () AS n
      FROM orders
    )
    SELECT CAST((r * 16 + n - 1) // n AS BIGINT) AS bucket,
           COUNT(*) AS n_rows,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM ranked GROUP BY 1
    """,
)
def win_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram of order value: 16 buckets of
    near-equal population with exact boundaries.

    Scale shape (operators/rank.py): the oracle's global window is ONE
    task in Spark; the engine instead range-partitions on the (price,
    key) total order, collects a P-row partition-size table, and adds
    exclusive prefix offsets to partition-local row_numbers — every pass
    parallel, bucket cuts integer-exact (ceil(r·k/n)) on both engines."""
    from land_registry_data_ingestion_spark.operators.rank import (
        equidepth_histogram,
    )

    t = load_tables(spark, sf_dir)
    return equidepth_histogram(
        t.orders, "o_totalprice", "o_orderkey", n_buckets=16
    )


@query(
    "rel_multi_join_chain",
    sql="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def rel_multi_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join cascade (TPC-H Q5 shape): local-supplier revenue by
    nation. The one declared query whose cost is JOIN ORDER, not any
    single operator. Written FACT-FIRST (round 11, guide §3.1): the
    dimension-first chain left lineitem as the last join's BUILD side, so
    the physical plan collected the entire fact table into a driver-built
    broadcast HashedRelation and probed it with the dimension chain —
    backwards at every scale (measured: the lineitem BroadcastExchange
    dominated the query; and at 100 TB the fact side must never be the
    build side). With lineitem first, every dimension (date-filtered
    orders, customer, nation, region, supplier) broadcasts and the fact
    table streams through the probe chain unshuffled; when a dimension
    outgrows the threshold the planner falls back to a key shuffle of
    exactly that join, never a fact-table broadcast. Inner-join
    reassociation only — identical join conditions and filters, so the
    rows are provably unchanged."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        t.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(t.region, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            t.supplier,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "agg_kmv_by_group",
    sql=f"""
    WITH h AS (
        SELECT DISTINCT o_orderpriority, ('0x' || substr(
            md5('{_KMV_SALT}|' || CAST(o_custkey AS VARCHAR)), 1, 15
        ))::BIGINT AS hv
        FROM orders
    ),
    r AS (
        SELECT o_orderpriority, hv,
               row_number() OVER (PARTITION BY o_orderpriority ORDER BY hv) AS rn
        FROM h
    ),
    s AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_seen,
               MAX(hv) AS max_hv
        FROM r WHERE rn <= {_KMV_K} GROUP BY o_orderpriority
    ),
    x AS (
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
        FROM orders GROUP BY o_orderpriority
    )
    SELECT s.o_orderpriority,
           ROUND(CASE WHEN s.n_seen < {_KMV_K} THEN CAST(s.n_seen AS DOUBLE)
                 ELSE ({_KMV_K} - 1) / (CAST(s.max_hv AS DOUBLE) / {_KMV_SCALE!r})
                 END, 4) AS est_distinct,
           x.exact_distinct
    FROM s JOIN x USING (o_orderpriority)
    """,
)
def agg_kmv_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV distinct sketches — `agg_kmv_distinct`'s estimator
    held per group, with the per-group k-smallest selection done by the
    SALTED two-phase top-k (operators/topk.py): 5 priority groups would
    otherwise mean 5 window reducers at 100 TB. Sketches stay mergeable
    (union + re-take k) across groups AND batches; the oracle replays
    hash, selection, and estimator bit-for-bit per group."""
    from land_registry_data_ingestion_spark.operators.dedup import _md5_hash64
    from land_registry_data_ingestion_spark.operators.topk import topk_per_group

    t = load_tables(spark, sf_dir)
    hashes = (
        t.orders.select(
            "o_orderpriority",
            _md5_hash64(F.col("o_custkey").cast("string"), _KMV_SALT).alias("hv"),
        )
        .distinct()
    )
    topk = topk_per_group(
        hashes, ["o_orderpriority"], [F.col("hv")], k=_KMV_K, salt_col="hv"
    )
    s = topk.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_seen"), F.max("hv").alias("max_hv")
    )
    x = t.orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_seen") < _KMV_K, F.col("n_seen").cast("double")
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        / (F.col("max_hv").cast("double") / F.lit(_KMV_SCALE))
    )
    return (
        s.join(x, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.round(est, 4).alias("est_distinct"),
            "exact_distinct",
        )
    )


@query(
    "win_running_total",
    sql="""
    WITH o AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(SUM(cents) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) / 100.0 AS running_total,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS BIGINT) AS order_seq
    FROM o
    """,
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend (lifetime-value curve): cumulative sum
    + order ordinal over the (date, key) order.

    Engine-neutral-exact via integer cents: window engines disagree on
    ADDITION ORDER for frame aggregates (DuckDB segment-trees them,
    Spark folds sequentially), which makes float running sums differ in
    late bits — summing BIGINT cents instead makes order irrelevant, and
    the single final division is the only float op. Shuffles once on the
    customer key; partitions bounded by per-customer order counts."""
    t = load_tables(spark, sf_dir)
    o = t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
            / F.lit(100.0)
        ).alias("running_total"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@query(
    "ord_intersect",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n_rows FROM (
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 250000
        INTERSECT
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ) GROUP BY o_orderstatus
    """,
)
def ord_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (completes O4/O5's union/except): high-value AND
    high-priority orders — planned as a hash semi-join after distinct,
    the same single-shuffle shape as the except query."""
    t = load_tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_orderstatus"
    )
    b = t.orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderstatus")
    return (
        a.intersect(b)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_rows"))
    )
