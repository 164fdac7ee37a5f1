"""Heavier analytics inventory: scan-dominated aggregation, big-big shuffle
join, event-time windowing (tumbling + session), as-of join, distinct /
approx-distinct aggregation, rollup, and the parameterized-SQL facade (S8).

These extend the reference's join/agg/top-k family (sql/queries.sql:22-45)
to the shapes a 100 TB warehouse actually runs. Same determinism rules as
inventory.py: decimal-accumulated double sums, unique tie-breaks on every
LIMIT/ORDER, no wall-clock functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as WindowSpec
from pyspark.sql import functions as F

from ..engine import Engine
from ..operators.asof import asof_self_join
from ..operators.sessions import sessionize
from ..sources.tables import load_table
from .inventory import register




# ---------------------------------------------------------------------------
# Scan-dominated aggregation (TPC-H Q1 shape): the canonical "does partial
# aggregation + whole-stage codegen carry the scan" benchmark query.
# ---------------------------------------------------------------------------
@register(
    "lineitem_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS sum_disc_price,
      CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-30 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 shape on the driver tables: predicate pushed to the parquet "
    "scan, map-side partial hash-agg over ~6 groups, one tiny shuffle. The "
    "scan-throughput headline query. Sums accumulate in DECIMAL for "
    "cross-engine bit-stability; per-row products are IEEE-deterministic.",
)
def lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    sum_qty_dec = F.sum(F.col("l_quantity").cast("decimal(18,2)"))

    def _qsum(col):  # quantize to 1e-6 grid -> exact integer accumulation
        return (
            F.sum(F.round(col * 1000000).cast("decimal(28,0)")).cast("double")
            / 1000000
        )

    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-30 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty_dec.cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            _qsum(disc_price).alias("sum_disc_price"),
            _qsum(charge).alias("sum_charge"),
            (sum_qty_dec.cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Big-big join (TPC-H Q3 shape): both sides filtered facts — the shuffle
# join whose partitioning strategy dominates at 100 TB.
# ---------------------------------------------------------------------------
@register(
    "top_orders_by_revenue",
    """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    "TPC-H Q3 shape: fact-fact equi-join on l_orderkey with selective "
    "pushed filters on BOTH sides before the shuffle, grouped revenue, "
    "top-10. At sf0.1 AQE picks broadcast for the filtered orders side; at "
    "100 TB it degrades gracefully to sort-merge on the co-partitioned key "
    "with skew-split — no plan change needed.",
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    revenue_q = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 1000000
    ).cast("decimal(28,0)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(revenue_q).cast("double") / 1000000).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Event-time windowing — the batch form of the Structured Streaming
# operators (F.window / F.session_window are stream-portable).
# ---------------------------------------------------------------------------
@register(
    "events_hourly_tumbling",
    """
    SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1 ORDER BY hour_start
    """,
    "Tumbling event-time window (1h): F.window — identical operator to a "
    "streaming windowed aggregation with a watermark; epoch-aligned so "
    "date_trunc('hour') is the exact oracle. Partial agg then one shuffle "
    "on ~720 window keys.",
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("_w.start").alias("hour_start"), "n_events", "total_value")
        .orderBy("hour_start")
    )


@register(
    "events_sliding_window",
    """
    WITH x AS (
      SELECT unnest(list_transform(range(0, 4), i ->
               make_timestamp(((epoch_ms(ts) // 900000) - i) * 900000 * 1000)))
               AS window_start,
             value
      FROM events)
    SELECT window_start, COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM x GROUP BY 1 ORDER BY window_start
    """,
    "Sliding event-time window (1h window, 15m slide): F.window(w, s) — "
    "each event lands in w/s = 4 overlapping windows (Spark Expand node). "
    "Oracle enumerates the 4 epoch-aligned 15m grid starts per event. "
    "Streaming-portable like the tumbling form.",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("_w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@register(
    "user_sessions",
    """
    WITH o AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 3600000
             THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (
      SELECT user_id, ts,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
    """,
    "Gap-based sessionization (1h gap) via native F.session_window — the "
    "same operator Structured Streaming uses for streaming sessions. "
    "Oracle is the lag/cumsum formulation (break iff gap STRICTLY > 1h — "
    "session_window merges an event landing exactly at last+gap; verified "
    "in tests/test_analytics_ops.py). Timestamps are unique per user in "
    "the fixture, so ordering is total.",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize(events, "user_id", "ts", gap="1 hour").orderBy(
        "user_id", "session_start"
    )


# ---------------------------------------------------------------------------
# As-of join: purchase -> last prior view attribution.
# ---------------------------------------------------------------------------
@register(
    "purchase_attribution_asof",
    """
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS asof_ts, v.event_id AS asof_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts < p.ts
    ORDER BY p.event_id
    """,
    "As-of join (operators/asof.py): for each purchase, the user's latest "
    "strictly-prior view. Union-tag-window implementation — one shuffle of "
    "|L|+|R| rows on user_id, no range-join candidate blow-up; DuckDB ASOF "
    "JOIN is the oracle. (ts unique per user -> deterministic.) Both sides "
    "are predicates over the SAME events table, so the single-scan form "
    "(asof_self_join, r14) replaces the two-scan union: one parquet read "
    "with event_type IN (purchase, view) pushed down, sides tagged per row.",
)
def purchase_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return asof_self_join(
        events,
        on="user_id",
        time="ts",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "view",
        left_cols=["event_id", "user_id", "ts"],
        value_cols=["ts", "event_id"],
        right_tiebreak="event_id",
        allow_exact_match=False,
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Distinct and approximate-distinct aggregation.
# ---------------------------------------------------------------------------
@register(
    "latest_event_argmax",
    """
    SELECT user_id,
           arg_max(event_id, ts) AS last_event_id,
           max(ts) AS last_ts
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    "Latest-per-key via max_by/arg_max — the aggregation-form alternative "
    "to the row_number window (latest_event_per_user): ONE hash aggregate, "
    "no per-partition sort, the cheaper plan when only specific columns of "
    "the latest row are needed. (ts unique per user -> deterministic.)",
)
def latest_event_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.max_by("event_id", "ts").alias("last_event_id"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


@register(
    "distinct_users_per_type",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    "Distinct aggregation: Catalyst expands to a two-phase partial-distinct "
    "plan (Expand + two hash aggs) — no driver-side dedup.",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "approx_distinct_users",
    None,  # HLL sketch values are engine-specific -> rows-only check
    "Approximate distinct (HyperLogLog++, rsd=0.01): the 100 TB-scale path "
    "for cardinality — mergeable sketches, no exact-distinct Expand blow-up. "
    "Accuracy vs exact COUNT(DISTINCT) asserted in pytest (<5% error).",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Rollup (multi-level aggregation in one pass).
# ---------------------------------------------------------------------------
@register(
    "rollup_event_daily",
    """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(ts AS DATE), DATE '9999-12-31') AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
    ORDER BY event_type, day
    """,
    "ROLLUP(event_type, day): per-day, per-type subtotal, and grand total "
    "in one Expand + hash-agg pass (vs 3 scans). Rollup NULLs mapped to "
    "sentinels for deterministic cross-engine ordering/hashing.",
)
def rollup_event_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.to_date("ts"))
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("9999-12-31").cast("date")).alias("day"),
            "n",
            "total_value",
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Analytic window functions (running totals, ranking) and pivot.
# ---------------------------------------------------------------------------
@register(
    "user_running_spend",
    """
    SELECT user_id, event_id, ts,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS event_seq
    FROM events ORDER BY user_id, event_seq
    """,
    "Analytic running aggregate: per-user cumulative value + event sequence "
    "number — cumulative frames shuffle once on the key then stream within "
    "partition. Decimal accumulation keeps the prefix sums bit-stable "
    "regardless of either engine's internal frame algorithm.",
)
def user_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        WindowSpec.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(WindowSpec.unboundedPreceding, WindowSpec.currentRow)
    )
    wseq = WindowSpec.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
        F.row_number().over(wseq).alias("event_seq"),
    ).orderBy("user_id", "event_seq")


@register(
    "event_type_salted_join",
    """
    WITH d AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_total
               FROM events GROUP BY event_type)
    SELECT e.event_type AS event_type, d.type_total AS type_total,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN d ON e.event_type = d.event_type
    GROUP BY e.event_type, d.type_total
    ORDER BY e.event_type
    """,
    "Hot-key join through the explicit salting operator "
    "(operators/skew.py salted_join): events carry only a handful of "
    "event_type values, so a plain shuffle join lands whole types on "
    "single tasks — the salt (pmod(xxhash64(event_id), 8)) spreads each "
    "type over 8 sub-keys while the replicated dim side meets every "
    "fact row exactly once; join semantics are provably identical to the "
    "plain join (this oracle IS the plain join). At test scale Spark "
    "broadcasts the tiny dim; the salted path is the plan you force when "
    "the dim outgrows broadcast AND one key dominates beyond what AQE "
    "skew-split can absorb.",
)
def event_type_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    events = load_table(spark, sf_dir, "events")
    dim = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("type_total")
    )
    joined = salted_join(
        events, dim, "event_type", salt_buckets=8, unique_key="event_id"
    )
    return (
        joined.groupBy("event_type", "type_total")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "customer_order_trailing_30d",
    """
    WITH o AS (SELECT o_orderkey, o_custkey,
                      date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS day,
                      o_totalprice
               FROM orders)
    SELECT o_orderkey, o_custkey, day,
      COUNT(*) OVER w AS n_trailing,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        AS spend_trailing
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
    "RANGE-frame (value-based) moving window: per customer, count and "
    "spend over the trailing 30 days of each order — the frame is bounded "
    "by the ORDER BY VALUE (epoch day), not row position, so same-day "
    "peers always share a frame and the result is deterministic without a "
    "full tie-break. Complements the ROWS frames elsewhere "
    "(user_running_spend). One shuffle on the uniform customer key, "
    "streaming frame evaluation within partition, decimal-exact sums.",
)
def customer_order_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("day"),
        "o_totalprice",
    )
    w = (
        WindowSpec.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, WindowSpec.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_trailing"),
    ).orderBy("o_orderkey")


_MORTON_SQL = " + ".join(
    f"(((gx >> {i}) & 1) << {2 * i}) + (((gy >> {i}) & 1) << {2 * i + 1})"
    for i in range(16)
)


@register(
    "orders_zorder_keys",
    f"""
    WITH o AS (SELECT o_orderkey, o_custkey,
                      date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS day
               FROM orders),
    b AS (SELECT MIN(o_custkey) AS xlo, MAX(o_custkey) AS xhi,
                 MIN(day) AS ylo, MAX(day) AS yhi FROM o),
    g AS (SELECT o_orderkey, o_custkey, day,
            ((o_custkey - xlo) * 65535) // (xhi - xlo) AS gx,
            ((day - ylo) * 65535) // (yhi - ylo) AS gy
          FROM o, b)
    SELECT o_orderkey, o_custkey, day,
           CAST({_MORTON_SQL} AS BIGINT) AS zkey
    FROM g ORDER BY zkey, o_orderkey LIMIT 50
    """,
    "Z-order (Morton) layout keys over (customer, order day) — "
    "operators/layout.py: exact integer grid scaling (remainder-free div, "
    "no doubles) + bit interleave as a flat shift/and chain, so the key "
    "is bit-identical cross-engine and oracle-checkable. This key is what "
    "zorder_write range-partitions on; the actual pruning win (files "
    "become tight (x,y) boxes; single-axis filters prune in BOTH "
    "dimensions) is asserted against real parquet footer min-max stats "
    "in tests/test_layout.py.",
)
def orders_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_key

    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("day"),
    )
    return (
        zorder_key(o, "o_custkey", "day", bits=16)
        .orderBy("zkey", "o_orderkey")
        .limit(50)
    )


@register(
    "order_rank_in_priority",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
      rank()       OVER w AS price_rank,
      dense_rank() OVER w AS price_dense_rank
    FROM orders
    WHERE o_totalprice > 400000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderpriority, price_rank, o_orderkey
    """,
    "Ranking family (rank / dense_rank) within a partition, fully "
    "deterministic via the orderkey tie-break; selective filter first so "
    "the window sorts a fraction of the table.",
)
def order_rank_in_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    w = WindowSpec.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    ).orderBy("o_orderpriority", "price_rank", "o_orderkey")


@register(
    "user_event_type_pivot",
    """
    SELECT user_id,
      COUNT(*) FILTER (event_type = 'click')    AS n_click,
      COUNT(*) FILTER (event_type = 'view')     AS n_view,
      COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
      COUNT(*) FILTER (event_type = 'signup')   AS n_signup,
      COUNT(*) FILTER (event_type = 'error')    AS n_error
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    "Pivot (wide conditional aggregation): groupBy().pivot() with explicit "
    "value list — one pass, one shuffle; explicit values keep the schema "
    "static (no distinct-scan planning step, required for streaming and "
    "sane at 100 TB).",
)
def user_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Schema-on-read semi-structured navigation (SUPER parity, F3/F4) — Variant.
# ---------------------------------------------------------------------------
@register(
    "props_variant_extract",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
    ORDER BY event_id
    """,
    "F3/F4 true schema-on-read: Redshift json_parse -> SUPER navigation "
    "(scripts/setup_redshift.sh:103, sql/incremental_sync_member_quests.sql"
    ":29-31) as Spark 4 VariantType — parse_json once, variant_get typed "
    "paths; binary-encoded variant beats re-parsing JSON text per path at "
    "scan time (the 100 TB semi-structured path).",
)
def props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return (
        events.select(
            "event_id",
            F.try_variant_get(v, "$.k", "string").alias("k_str"),
            F.try_variant_get(v, "$.k", "long").alias("k_num"),
        )
        .filter(F.col("k_str").isNotNull())
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Parameterized SQL facade (S8): execute-statement with named parameters.
# ---------------------------------------------------------------------------
@register(
    "param_events_by_user",
    """
    SELECT event_id, ts, event_type, value FROM events
    WHERE user_id = 7 ORDER BY event_id
    """,
    "S8+P4: the redshift-data execute-statement named-parameter contract "
    "(scripts/test_sync_time.sh:86-87 'WHERE pk = :pk') via Engine.run_sql "
    "-> spark.sql(args=...) — typed literal binding, pushdown-safe.",
)
def param_events_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = Engine(spark, sf_dir)
    return eng.run_sql(
        "SELECT event_id, ts, event_type, value FROM events "
        "WHERE user_id = :uid ORDER BY event_id",
        {"uid": 7},
    )


# ---------------------------------------------------------------------------
# SCD Type 2 history (beyond-reference: the reference's merge keeps latest
# state only — sql/incremental_sync_members.sql:42-47 deletes the prior row;
# this keeps every version as a validity interval).
# ---------------------------------------------------------------------------
@register(
    "user_state_history",
    """
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from, is_current
    """,
    "SCD Type 2: each event opens a half-open validity interval per user, "
    "closed by the next event (operators/scd.scd2_history — one lead window "
    "keyed by the entity key, one skew-free shuffle; event_id tie-break "
    "keeps replays deterministic).",
)
def user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_history

    events = load_table(spark, sf_dir, "events")
    hist = scd2_history(
        events.select("user_id", F.col("event_type").alias("state"), "ts",
                      "event_id"),
        key_cols=["user_id"],
        ts_col="ts",
        tie_cols=["event_id"],
    )
    return hist.select(
        "user_id", "state", "valid_from", "valid_to", "is_current"
    ).orderBy("user_id", "valid_from", "is_current")


# ---------------------------------------------------------------------------
# Unpivot / melt (the inverse of user_event_type_pivot): wide metric columns
# back to (key, metric, value) rows — the shape exports and ML feature
# stores want. Narrow-to-wide-to-narrow must round-trip exactly.
# ---------------------------------------------------------------------------
@register(
    "user_event_type_unpivot",
    """
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    "Unpivot (DataFrame.unpivot -> Expand): melts the pivoted wide table "
    "back to long rows. Expand is a zero-shuffle map-side operator (each "
    "input row fans out to K rows); dropping the pivot's null-fill zeros "
    "recovers the original long form exactly — asserted by the oracle being "
    "the direct GROUP BY.",
)
def user_event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["click", "view", "purchase", "signup", "error"]
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
    )
    return (
        wide.unpivot(
            ["user_id"], [f"n_{t}" for t in types], "event_type", "n"
        )
        .withColumn("event_type", F.expr("substring(event_type, 3)"))
        .filter(F.col("n") > 0)  # pivot null-fill zeros are not source rows
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# Product-analytics trio: funnel conversion, cohort retention, and hourly
# gap-fill. The event-analytics shapes a CDC-fed warehouse (the reference's
# whole purpose) serves to dashboards daily; none needs more than keyed
# shuffles and bounded grids.
# ---------------------------------------------------------------------------
@register(
    "funnel_conversion",
    """
    WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS c_ts
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS p_ts
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
          GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel
    """,
    "Ordered funnel conversion (view -> click-after-view -> "
    "purchase-after-click): each stage is first-touch, strictly after the "
    "previous stage's first touch. Plan: three conditional-min "
    "aggregations chained by equi-joins on user_id — every shuffle is "
    "keyed by the uniform user key and each stage's input shrinks to the "
    "surviving users; no per-user event arrays are ever materialized, so "
    "a power user with 10^7 events costs nothing extra.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lineage import truncate_lineage

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # each stage table is per-user (user-cardinality, far below event
    # volume) and feeds both the next stage and its own count —
    # checkpointed, the event log is scanned once per stage (3 total)
    # instead of once per consuming subtree (6)
    v = truncate_lineage(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = truncate_lineage(
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_full_funnel"))
    return nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))


@register(
    "retention_cohorts",
    """
    WITH cohort AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
                    FROM events GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT datediff('day', cohort_day, day) AS days_since,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN cohort USING (user_id)
    WHERE datediff('day', cohort_day, day) <= 7
    GROUP BY days_since ORDER BY days_since
    """,
    "Cohort retention curve: users active N days after their first-ever "
    "day, N <= 7. Plan: per-user cohort day and distinct activity days "
    "both collapse map-side on the uniform user key, the join stays on "
    "that key's partitioning (no extra exchange), and the final "
    "aggregation has <= 8 groups.",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lineage import truncate_lineage

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    # ONE event scan: distinct (user, day) activity is checkpointed
    # (bounded at users x active-days, far below event volume) and the
    # cohort day derives FROM it — min over distinct days equals min
    # over all events' days
    activity = truncate_lineage(ev.distinct())
    cohort = activity.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        activity.join(cohort, "user_id")
        .select(F.datediff("day", "cohort_day").alias("days_since"), "user_id")
        .filter(F.col("days_since") <= 7)
        .groupBy("days_since")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("days_since")
    )


@register(
    "events_hourly_gapfill",
    """
    WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS lo,
                           date_trunc('hour', max(ts)) AS hi FROM events),
    grid AS (SELECT t.h, et.event_type
             FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                     AS h FROM bounds) t
             CROSS JOIN (SELECT DISTINCT event_type FROM events) et),
    agg AS (SELECT date_trunc('hour', ts) AS h, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS tv
            FROM events GROUP BY 1, 2)
    SELECT g.event_type, g.h,
           COALESCE(a.n, 0) AS n_events,
           COALESCE(a.tv, 0.0) AS total_value,
           last_value(a.tv IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN agg a ON g.h = a.h AND g.event_type = a.event_type
    ORDER BY g.event_type, g.h
    """,
    "Time-bucket gap-fill: the hourly (event_type, hour) grid is "
    "generated with sequence+explode between the global bounds, "
    "zero-filled counts/sums left-join in, and missing hours "
    "forward-fill the last observed hourly total (last_value IGNORE "
    "NULLS). Plan: the grid is bounded by hours x types (independent of "
    "event count), the real aggregation collapses map-side, and the "
    "forward-fill window runs per type over the bounded grid — at 100 TB "
    "the expensive side stays a single partial-agg scan.",
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .inventory import _dsum
    from ..operators.lineage import truncate_lineage

    ev = load_table(spark, sf_dir, "events")
    # ONE event scan: the hourly aggregate is checkpointed
    # (hours x types rows, bounded independent of event count) and the
    # grid's bounds and type set derive FROM it — min/max over truncated
    # hours equal the truncated min/max ts, and any type with a row in
    # events has a row here. The previous shape scanned events three
    # times (bounds, distinct types, aggregate).
    agg = truncate_lineage(
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            _dsum("value", "tv"),
        )
    )
    bounds = agg.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = agg.select("event_type").distinct()
    grid = hours.crossJoin(F.broadcast(types))
    w = (
        WindowSpec.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(WindowSpec.unboundedPreceding, WindowSpec.currentRow)
    )
    return (
        grid.join(agg, ["h", "event_type"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_events"),
            F.coalesce(F.col("tv"), F.lit(0.0)).alias("total_value"),
            F.last("tv", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("event_type", "h")
    )


# ---------------------------------------------------------------------------
# Statistical anomaly detection on the event stream: hourly volumes more
# than 2 sigma from their type's mean — the monitoring query a CDC-fed
# warehouse (the reference's sync-lag monitors, sql/queries.sql:1-19)
# grows into once volumes matter, not just latencies.
# ---------------------------------------------------------------------------
@register(
    "events_hourly_anomalies",
    """
    WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS h,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2),
    st AS (SELECT event_type,
                  CAST(COUNT(*) AS BIGINT) AS cnt,
                  CAST(SUM(n) AS BIGINT) AS s1,
                  CAST(SUM(n * n) AS BIGINT) AS s2
           FROM hc GROUP BY event_type),
    z AS (SELECT hc.event_type, hc.h, hc.n,
                 round((CAST(hc.n AS DOUBLE)
                        - CAST(s1 AS DOUBLE) / cnt)
                       / sqrt(CAST(cnt * s2 - s1 * s1 AS DOUBLE)
                              / (CAST(cnt AS DOUBLE) * (cnt - 1))), 6)
                   AS zscore
          FROM hc JOIN st USING (event_type)
          WHERE cnt >= 2)
    SELECT event_type, h, n, zscore
    FROM z WHERE abs(zscore) >= 2.0
    ORDER BY event_type, h
    """,
    "Hourly volume anomalies: per-type z-scores of hourly event counts, "
    "flagged at |z| >= 2. Bit-stable without quantization: counts and "
    "their squares accumulate as EXACT integers (sum/sumsq — the "
    "mergeable two-pass-free variance form), and mean/sigma/z are a "
    "FIXED sequence of IEEE ops both engines evaluate identically; the "
    "predicate tests the 1e-6-rounded score so no boundary can flip. "
    "Plan: two bounded-key aggregations (hours x types, then types) + a "
    "broadcast join back — the event table is scanned once. At extreme "
    "per-hour volumes the int64 sumsq would need DECIMAL widening; the "
    "shape is unchanged.",
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    st = hc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("n").cast("bigint").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("cnt")
    sigma = F.sqrt(
        (F.col("cnt") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("cnt").cast("double") * (F.col("cnt") - 1))
    )
    return (
        hc.join(F.broadcast(st.filter(F.col("cnt") >= 2)), "event_type")
        .select(
            "event_type",
            "h",
            "n",
            F.round((F.col("n").cast("double") - mean) / sigma, 6).alias(
                "zscore"
            ),
        )
        .filter(F.abs(F.col("zscore")) >= 2.0)
        .orderBy("event_type", "h")
    )


@register(
    "user_reach_hll_rollup",
    None,  # Datasketches HLL binary sketches are engine-specific ->
    #       rows-only check; estimate accuracy, merge algebra, and the
    #       parquet round-trip of the sketch column are pinned in
    #       tests/test_sketches.py
    "Mergeable-sketch materialization (operators/sketches.py): events are "
    "sketched ONCE per (event_type, day) into kilobyte Datasketches HLL "
    "binaries — the persistable artifact — then per-type reach AND the "
    "all-types total are both answered by MERGING sketches (hll_union_agg), "
    "never rescanning the events. At 100 TB this turns every later "
    "cardinality question (regroup, roll-up, cross-table union) into "
    "kilobyte algebra; contrast approx_distinct_users, which answers one "
    "question per scan. Fully JVM: no Python boundary, one shuffle keyed "
    "by the bounded (type, day) shard key.",
)
def user_reach_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import merged_estimate, shard_sketches

    events = load_table(spark, sf_dir, "events")
    shards = shard_sketches(
        events.select("event_type", F.to_date("ts").alias("day"), "user_id"),
        ["event_type", "day"],
        "user_id",
    )
    # one materialized sketch table serves BOTH groupings (the whole
    # point: roll-ups read sketches, not events)
    from ..operators.lineage import truncate_lineage

    shards = truncate_lineage(shards)
    per_type = merged_estimate(shards, ["event_type"], out_col="reach").select(
        "event_type", "reach"
    )
    total = merged_estimate(shards, out_col="reach").select(
        F.lit("__all__").alias("event_type"), "reach"
    )
    return per_type.unionByName(total).orderBy("event_type")


@register(
    "user_reach_kmv_sketch",
    """
    WITH sk AS (
      SELECT event_type, list(g ORDER BY g)[:128] AS sketch FROM (
        SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS g
        FROM events WHERE user_id IS NOT NULL
      ) GROUP BY event_type
    ), ex AS (SELECT event_type, unnest(sketch) AS h FROM sk)
    SELECT event_type,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY h) - 1
                AS BIGINT) AS pos,
           h
    FROM ex
    ORDER BY event_type, pos
    """,
    "Deterministic KMV distinct-count sketches (operators/sketches.py "
    "kmv_sketches/kmv_merge — Bar-Yossef et al. 2002): events are sketched "
    "per (event_type, day) shard — one Arrow partial pass emitting <=k "
    "hashes per shard per batch, the corpus never shuffles — then rolled "
    "up to per-type sketches by pure min-k array algebra over kilobyte "
    "rows. The oracle restates the SEMANTIC directly (min-128 of the md5 "
    "hashes of each type's distinct users), so a green hash row proves the "
    "shard->merge path loses NOTHING relative to sketching the raw union — "
    "the exactness that makes KMV the driver-checkable twin of "
    "user_reach_hll_rollup's engine-private HLL binaries.",
)
def user_reach_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import kmv_merge, kmv_sketches

    events = load_table(spark, sf_dir, "events")
    day_shards = kmv_sketches(
        events.select("event_type", F.to_date("ts").alias("day"), "user_id"),
        ["event_type", "day"],
        "user_id",
        k=128,
    )
    merged = kmv_merge(day_shards, ["event_type"], k=128)
    return (
        merged.select(
            "event_type", F.posexplode("sketch").alias("pos", "h")
        )
        .select("event_type", F.col("pos").cast("bigint").alias("pos"), "h")
        .orderBy("event_type", "pos")
    )


@register(
    "purchases_in_error_windows",
    """
    WITH iv AS (
      SELECT event_id AS window_id, epoch_us(ts) AS w_start,
             epoch_us(ts) + 600000000 AS w_end
      FROM events WHERE event_type = 'error'
    ), pt AS (
      SELECT epoch_us(ts) AS p_us, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT window_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM iv JOIN pt ON pt.p_us >= iv.w_start AND pt.p_us <= iv.w_end
    GROUP BY window_id
    ORDER BY window_id
    """,
    "Binned range join (operators/rangejoin.point_in_interval_join): "
    "purchases falling inside 10-minute incident windows opened by error "
    "events — a bare interval predicate with no equi-key, the query shape "
    "Spark would otherwise execute as an O(|L|*|R|) "
    "BroadcastNestedLoopJoin. Binning turns it into a hash equi-join on "
    "the bin id (points carry ONE bin; intervals explode into <=2 bins at "
    "width=interval length) with the exact predicate as a residual — "
    "measured 18x over the naive plan at 1M x 100k (SCALE.md). The oracle "
    "is DuckDB's native range join over the identical exact-microsecond "
    "predicate, so the hash row proves the binned plan's pair set is "
    "EXACTLY the predicate's.",
)
def purchases_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rangejoin import point_in_interval_join

    events = load_table(spark, sf_dir, "events")
    intervals = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.unix_micros("ts").alias("w_start"),
        (F.unix_micros("ts") + F.lit(600_000_000)).alias("w_end"),
    )
    points = events.filter(F.col("event_type") == "purchase").select(
        F.unix_micros("ts").alias("p_us"), "value"
    )
    pairs = point_in_interval_join(
        points, intervals, "p_us", "w_start", "w_end", bin_width=600_000_000
    )
    return (
        pairs.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("window_id")
    )


@register(
    "orders_quality_report",
    """
    WITH t AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_nn,
             SUM(CASE WHEN o_totalprice IS NOT NULL
                       AND NOT (o_totalprice >= 0 AND o_totalprice <= 300000)
                      THEN 1 ELSE 0 END) AS v_rng,
             SUM(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O', 'F')
                      THEN 1 ELSE 0 END) AS v_acc,
             SUM(CASE WHEN o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o_orderpriority, '^[1-3]-')
                      THEN 1 ELSE 0 END) AS v_re,
             COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_uni
      FROM orders
    ), fk AS (
      SELECT COUNT(*) AS v FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT * FROM (
      SELECT 'not_null(o_custkey)' AS "check", n AS n_rows,
             CAST(v_nn AS BIGINT) AS violations, v_nn = 0 AS passed FROM t
      UNION ALL
      SELECT 'in_range(o_totalprice,0,300000)', n,
             CAST(v_rng AS BIGINT), v_rng = 0 FROM t
      UNION ALL
      SELECT 'accepted_values(o_orderstatus)', n,
             CAST(v_acc AS BIGINT), v_acc = 0 FROM t
      UNION ALL
      SELECT 'matches(o_orderpriority)', n,
             CAST(v_re AS BIGINT), v_re = 0 FROM t
      UNION ALL
      SELECT 'unique(o_orderkey)', n,
             CAST(v_uni AS BIGINT), v_uni = 0 FROM t
      UNION ALL
      SELECT 'referential_integrity(o_custkey)',
             (SELECT n FROM t), CAST(v AS BIGINT), v = 0 FROM fk
    )
    ORDER BY "check"
    """,
    "One-scan data-quality expectation suite (operators/expectations.py "
    "validate + referential_integrity): five row/table-level checks over "
    "orders — not-null, range, accepted values, regex, key uniqueness — "
    "compile to ONE conditional aggregation over ONE scan (plan-asserted "
    "in tests/test_expectations.py), plus the FK check's broadcast "
    "left-anti orphan count against customer. The range and "
    "accepted-values thresholds are chosen to FIND violations at every SF "
    "(6033 over-price rows, 5088 'P' statuses at sf0.01), so the hash row "
    "proves violation COUNTING, not just all-green plumbing. The engine's "
    "generalization of the reference's blind-trust stream ingestion "
    "(SURVEY.md: no validation anywhere) into declarative table "
    "contracts.",
)
def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import (
        accepted_values,
        in_range,
        matches,
        not_null,
        referential_integrity,
        unique,
        validate,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    checks = [
        not_null("o_custkey"),
        in_range("o_totalprice", 0, 300000),
        accepted_values("o_orderstatus", ["O", "F"]),
        matches("o_orderpriority", "^[1-3]-"),
        unique("o_orderkey"),
    ]
    report = validate(orders, checks).unionByName(
        referential_integrity(orders, customer, "o_custkey", "c_custkey")
    )
    return report.orderBy("check")


# ---------------------------------------------------------------------------
# Round-10 promotion of the staged drift-profile driver row. Implemented and
# foreign-CWD DuckDB-proven in round 9 (plans/staged_r10.py carries the full
# rationale and the oracle construction); this wrapper is the only new code
# in the path.
# ---------------------------------------------------------------------------
from . import staged_r10 as _staged_r10  # noqa: E402

events_value_drift_profile = register(
    "events_value_drift_profile",
    _staged_r10.STAGED_R10["events_value_drift_profile"][1],
    "Drift-profile driver row: operators/drift.profile over events — exact "
    "int64 (column, bucket, cnt) histogram rows with the FULL declared "
    "support (zero-count buckets materialized, __nan__/__null__/__other__ "
    "paths exercised), computed as ONE conditional aggregation over one "
    "scan. Oracle restates every declared bucket as a DuckDB filtered "
    "count.",
)(_staged_r10.events_value_drift_profile)


# Registration complete for this module — trigger the driver-window reorder
# (no-op until the LAST registering module finishes; see inventory.py).
from .inventory import _maybe_reorder_registry  # noqa: E402

_maybe_reorder_registry()
