"""Wider SQL-surface inventory: generators (explode), analytic lead/lag,
HAVING, scalar subqueries, CUBE grouping sets, conditional aggregation,
ordered string aggregation, and exact percentiles.

The reference's queries (sql/queries.sql) never leave the join/agg/top-k
family; a user replacing Redshift with this engine keeps the rest of the
warehouse SQL surface too, so each shape here is driver-checked against
DuckDB like the core inventory. Same determinism rules as inventory.py:
decimal-accumulated double sums, quantized interpolated stats, unique
tie-breaks on every LIMIT, no wall-clock functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..streaming.joins import view_purchase_attribution
from .inventory import _dsum, register


def _dec(col) -> F.Column:
    """decimal(18,2) cast for sums whose INPUT needs a CASE/COALESCE wrap —
    plain whole-column sums use inventory._dsum directly."""
    return (col if isinstance(col, F.Column) else F.col(col)).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Generator / LATERAL VIEW: explode a tokenized text column. The row-exploding
# operator every text pipeline needs; stays inside whole-stage codegen
# (Generate node), shuffle carries (token, partial count) only.
# ---------------------------------------------------------------------------
@register(
    "doc_token_topk",
    """
    SELECT token, COUNT(*) AS n_tokens
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    WHERE token <> ''
    GROUP BY token
    ORDER BY n_tokens DESC, token
    LIMIT 25
    """,
    "Explode/generator family: whitespace-tokenize documents.text, count "
    "token frequencies, top-25. Generate -> partial hash-agg -> single "
    "small shuffle; the shuffle carries one row per (task, token), never "
    "the exploded rows themselves.",
)
def doc_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
        .orderBy(F.desc("n_tokens"), F.asc("token"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# HAVING: post-aggregation predicate (filter above the agg, pushed nowhere).
# ---------------------------------------------------------------------------
@register(
    "order_priority_having",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    HAVING COUNT(*) >= 10
    ORDER BY o_orderpriority
    """,
    "HAVING clause: group orders by priority, keep groups with >= 10 "
    "orders. The predicate sits above the aggregate in the plan (a plain "
    "Filter on agg output), distinct from pushed-down scan filters.",
)
def order_priority_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice", "total_price"),
        )
        .filter(F.col("n_orders") >= 10)
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Conditional aggregation: SUM(CASE WHEN ...) — one scan computing several
# predicated aggregates at once (the idiom that replaces N filtered scans).
# ---------------------------------------------------------------------------
@register(
    "returns_conditional_agg",
    """
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS returned_qty,
      CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN CAST(l_quantity AS DECIMAL(18,2))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS kept_qty,
      COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    "Conditional aggregation: returned vs kept quantity per line status in "
    "ONE pass over lineitem — N predicated sums share a single scan and a "
    "single two-phase hash-agg instead of N filtered subqueries.",
)
def returns_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", _dec("l_quantity")).otherwise(zero)
            )
            .cast("double")
            .alias("returned_qty"),
            F.sum(
                F.when(F.col("l_returnflag") != "R", _dec("l_quantity")).otherwise(zero)
            )
            .cast("double")
            .alias("kept_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Scalar subquery: compare every row against a global aggregate. Declared as
# a cross join against a broadcast 1-row aggregate — the whole comparison
# stays distributed; nothing is collected to the driver.
# ---------------------------------------------------------------------------
@register(
    "orders_above_avg_price",
    """
    WITH stats AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_price
      FROM orders
    )
    SELECT o_orderpriority, COUNT(*) AS n_above,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_above
    FROM orders, stats
    WHERE o_totalprice > avg_price
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "Scalar-subquery shape: orders above the global average price, grouped "
    "by priority. The 1-row average is broadcast-cross-joined (no driver "
    "collect); avg accumulates in DECIMAL then divides once in double, so "
    "the threshold is bit-identical across engines.",
)
def orders_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    stats = orders.agg(
        (F.sum(_dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    return (
        orders.crossJoin(F.broadcast(stats))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            _dsum("o_totalprice", "total_above"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# CUBE: all 4 grouping sets of (event_type, event_day) in one Expand pass —
# the generalization of the rollup already in inventory_analytics.
# ---------------------------------------------------------------------------
@register(
    "event_type_daily_cube",
    """
    SELECT event_type, event_day,
           2 * GROUPING(event_type) + GROUPING(event_day) AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (SELECT event_type, CAST(ts AS DATE) AS event_day, value FROM events) e
    GROUP BY CUBE(event_type, event_day)
    ORDER BY gid, event_type, event_day
    """,
    "CUBE grouping sets: counts + sums for (type, day), (type), (day), and "
    "() in ONE scan via Expand — 4 grouping sets share a single shuffle "
    "instead of a UNION of 4 aggregations. gid disambiguates NULL-as-ALL "
    "from genuine NULL group keys.",
)
def event_type_daily_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type", F.col("ts").cast("date").alias("event_day"), "value"
    )
    return (
        base.cube("event_type", "event_day")
        .agg(
            (F.grouping("event_type") * 2 + F.grouping("event_day")).alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value", "total_value"),
        )
        .select("event_type", "event_day", "gid", "n_events", "total_value")
        .orderBy("gid", "event_type", "event_day")
    )


# ---------------------------------------------------------------------------
# LEAD/LAG analytic: inter-event gap per user. One hash shuffle on the key +
# in-partition sort; state is a single previous row per partition stream.
# ---------------------------------------------------------------------------
@register(
    "event_gap_topk",
    """
    SELECT user_id, event_id, gap_us FROM (
      SELECT user_id, event_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events) g
    WHERE gap_us IS NOT NULL
    ORDER BY gap_us DESC, user_id, event_id
    LIMIT 20
    """,
    "LAG window function: microsecond gap between consecutive events per "
    "user, top-20 largest gaps. Exact integer microsecond arithmetic "
    "(unix_micros / epoch_us) — no float time math; (user_id, event_id) "
    "tie-break makes the LIMIT deterministic.",
)
def event_gap_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            "event_id",
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
                "gap_us"
            ),
        )
        .filter(F.col("gap_us").isNotNull())
        .orderBy(F.desc("gap_us"), F.asc("user_id"), F.asc("event_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation: per-user sorted distinct event-type profile.
# collect_list is bounded here by the distinct type cardinality (tiny), so
# per-group state is O(#types), not O(#events).
# ---------------------------------------------------------------------------
@register(
    "user_event_type_profile",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS type_profile,
           COUNT(*) AS n_types
    FROM ut
    GROUP BY user_id
    ORDER BY user_id
    """,
    "Ordered string_agg: comma-joined sorted distinct event types per user "
    "(Spark: array_join(array_sort(collect_list)) over a pre-distinct "
    "input). The distinct bounds per-group state to the type cardinality; "
    "the deterministic sort inside the aggregate makes the string "
    "order-stable across engines and partitionings.",
)
def user_event_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    return (
        ut.groupBy("user_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias(
                "type_profile"
            ),
            F.count(F.lit(1)).alias("n_types"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Outer joins — absent from the reference (SURVEY.md §2.4) but part of any
# complete relational surface. Left: preserved-side rows with no match keep
# NULL/zero aggregates; full: both sides preserved.
# ---------------------------------------------------------------------------
@register(
    "customer_order_counts_left",
    """
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
             AS total_price
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    "LEFT OUTER join + COUNT(col): every customer appears, zero-order "
    "customers keep n_orders = 0 and total 0 (COUNT over a nullable join "
    "column counts matches only). Join strategy is left to AQE: the "
    "preserved side constrains which side may be the broadcast build side.",
)
def customer_order_counts_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("c_custkey")
    )


@register(
    "supplier_customer_nations_full",
    """
    WITH sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                FROM supplier GROUP BY s_nationkey),
         cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
                FROM customer GROUP BY c_nationkey)
    SELECT COALESCE(sn.nationkey, cn.nationkey) AS nationkey,
           COALESCE(n_suppliers, 0) AS n_suppliers,
           COALESCE(n_customers, 0) AS n_customers
    FROM sn FULL OUTER JOIN cn ON sn.nationkey = cn.nationkey
    ORDER BY nationkey
    """,
    "FULL OUTER join of two pre-aggregated sides: nations having only "
    "suppliers or only customers survive with a zero on the missing side. "
    "Pre-aggregation shrinks both inputs to nation cardinality before the "
    "join — the scalable order of operations at any SF.",
)
def supplier_customer_nations_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return (
        sn.join(cn, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Interval (band) join — the BATCH form of streaming/joins.interval_join,
# oracle-checked here so the stream-stream operator's semantics are pinned
# against SQL, not just against our own batch implementation.
# ---------------------------------------------------------------------------
@register(
    "view_purchase_interval_join",
    """
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase')
    SELECT v.user_id, view_id, view_ts, purchase_id, purchase_ts
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND p.purchase_ts >= v.view_ts
     AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
    """,
    "Interval/band join: purchases within 30 min after a view by the same "
    "user — equi-join on user_id with the time band as a residual "
    "predicate, so the shuffle is keyed (never a cartesian). Identical "
    "code runs as a watermark-bounded stream-stream join "
    "(streaming/joins.py; tests assert stream == batch).",
)
def view_purchase_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return view_purchase_attribution(load_table(spark, sf_dir, "events")).select(
        "user_id", "view_id", "view_ts", "purchase_id", "purchase_ts"
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles, quantized. Spark `percentile` and DuckDB
# `quantile_cont` both sort-and-interpolate; the two engines' interpolation
# expressions can differ in the last ulp, so results are snapped to the
# coarse grid the 2-decimal input data actually lives on.
# ---------------------------------------------------------------------------
@register(
    "order_price_percentiles",
    """
    SELECT
      CAST(round(quantile_cont(o_totalprice, 0.25) * 10000) AS BIGINT) AS p25_q4,
      CAST(round(quantile_cont(o_totalprice, 0.50) * 10000) AS BIGINT) AS p50_q4,
      CAST(round(quantile_cont(o_totalprice, 0.75) * 10000) AS BIGINT) AS p75_q4,
      COUNT(*) AS n_orders
    FROM orders
    """,
    "Exact percentiles (p25/p50/p75) of order price. Interpolated values "
    "land on a 2.5e-3 grid (2-decimal inputs, quarter fractions), so "
    "quantizing to 1e-4 absorbs cross-engine interpolation ulp while "
    "remaining an exact check. The 100 TB path swaps in approx_percentile "
    "(mergeable t-digest-style sketch) — same query shape.",
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def q(p: float, alias: str) -> F.Column:
        return (
            F.round(F.percentile(F.col("o_totalprice"), F.lit(p)) * 10000)
            .cast("long")
            .alias(alias)
        )

    return orders.agg(
        q(0.25, "p25_q4"),
        q(0.50, "p50_q4"),
        q(0.75, "p75_q4"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "order_price_approx_percentiles",
    None,  # sketch output is implementation-defined — rows-only; the
    #       relative-error bound vs the exact form is pinned in
    #       tests/test_analytics_ops.py
    "The 100 TB percentile path the exact form above documents: "
    "percentile_approx (KLL-style mergeable sketch — per-partition "
    "sketches merge associatively on one tiny shuffle; no global sort, "
    "unlike exact percentile's per-group value collection). "
    "accuracy=10000 bounds rank error at 1e-4·n.",
)
def order_price_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        F.col("o_totalprice"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000
    )
    return orders.agg(
        pct[0].alias("p25"),
        pct[1].alias("p50"),
        pct[2].alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# GROUPING SETS — the general form behind CUBE/ROLLUP: an explicit,
# asymmetric set list ((type, day), (day)) that neither CUBE nor ROLLUP can
# express. Same Expand physical operator: both sets share ONE scan and ONE
# shuffle instead of a UNION of two aggregations.
# ---------------------------------------------------------------------------
@register(
    "event_type_grouping_sets",
    """
    SELECT event_type, event_day,
           2 * GROUPING(event_type) + GROUPING(event_day) AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (SELECT event_type, CAST(ts AS DATE) AS event_day, value FROM events) e
    GROUP BY GROUPING SETS ((event_type, event_day), (event_day))
    ORDER BY gid, event_type, event_day
    """,
    "Explicit GROUPING SETS ((type, day), (day)) via DataFrame.groupingSets "
    "— asymmetric set list CUBE/ROLLUP cannot express, one Expand + one "
    "shuffle; gid disambiguates NULL-as-ALL from genuine NULL keys.",
)
def event_type_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type", F.col("ts").cast("date").alias("event_day"), "value"
    )
    return (
        base.groupingSets(
            [["event_type", "event_day"], ["event_day"]],
            "event_type", "event_day",
        )
        .agg(
            (F.grouping("event_type") * 2 + F.grouping("event_day")).alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            _dsum("value", "total_value"),
        )
        .select("event_type", "event_day", "gid", "n_events", "total_value")
        .orderBy("gid", "event_type", "event_day")
    )


# ---------------------------------------------------------------------------
# Correlated-subquery family (TPC-H Q4/Q17/Q21/Q11 shapes). Redshift users
# write these daily; each decorrelates into the join the optimizer would
# pick at scale — EXISTS -> left-semi, NOT EXISTS -> left-anti, correlated
# aggregate -> grouped subplan joined back — never a per-row re-scan.
# ---------------------------------------------------------------------------
@register(
    "late_ship_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "TPC-H Q4 shape: orders with at least one lineitem shipped >60 days "
    "after order date, counted by priority. The correlated EXISTS "
    "decorrelates to ONE left-semi hash join on l_orderkey (the date "
    "predicate rides as a join residual), so each order is emitted at most "
    "once with no pre-aggregation of the 4x-larger lineitem side.",
)
def late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "small_quantity_part_revenue",
    """
    WITH keys AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
    part_avg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem JOIN keys ON l_partkey = p_partkey
      GROUP BY l_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part_avg pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.2 * pa.avg_qty
    """,
    "TPC-H Q17 shape: revenue from small-quantity orders of one brand's "
    "parts. The correlated per-part AVG subquery decorrelates to a grouped "
    "aggregate joined back on l_partkey; the brand filter broadcasts FIRST "
    "(left-semi on the small key set) so the per-part average only "
    "aggregates that brand's lineitems, never the whole table. Threshold "
    "is decimal-sum/count double on both engines — bit-identical compare.",
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    brand_li = li.join(
        F.broadcast(keys), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    part_avg = brand_li.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    small = brand_li.alias("l").join(
        F.broadcast(part_avg).alias("pa"), on="l_partkey"
    ).filter(F.col("l.l_quantity") < 0.2 * F.col("pa.avg_qty"))
    return small.agg(
        F.count(F.lit(1)).cast("long").alias("n_small_lines"),
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly"),
    )


@register(
    "lone_late_supplier",
    """
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT f1.l_suppkey, COUNT(*) AS n_waits
    FROM flagged f1
    WHERE f1.late
      AND EXISTS (SELECT 1 FROM flagged f2
                  WHERE f2.l_orderkey = f1.l_orderkey
                    AND f2.l_suppkey <> f1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged f3
                      WHERE f3.l_orderkey = f1.l_orderkey
                        AND f3.l_suppkey <> f1.l_suppkey
                        AND f3.late)
    GROUP BY f1.l_suppkey
    ORDER BY n_waits DESC, f1.l_suppkey
    LIMIT 10
    """,
    "TPC-H Q21 shape: suppliers who were the ONLY late shipper on "
    "multi-supplier orders. The correlated EXISTS + NOT EXISTS pair is "
    "algebraized away entirely: per order, EXISTS(other supplier) is "
    "|distinct suppliers| >= 2 and NOT EXISTS(other LATE supplier) — for "
    "a row that is itself late — is |distinct late suppliers| = 1, so "
    "both predicates become per-order window counts over ONE "
    "lateness-flagged scan. One shuffle on l_orderkey replaces the "
    "semi-join + anti-join pair and their two extra evaluations of the "
    "lineitem-orders join (3 lineitem scans -> 1); per-order state is "
    "bounded by suppliers-per-order.",
)
def lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    flagged = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
        ).alias("late"),
    )
    w = Window.partitionBy("l_orderkey")
    annotated = flagged.select(
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("late"), F.col("l_suppkey"))
            ).over(w)
        ).alias("n_late_supp"),
    )
    return (
        annotated.filter(
            F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_waits"))
        .orderBy(F.desc("n_waits"), F.asc("l_suppkey"))
        .limit(10)
    )


@register(
    "part_revenue_share",
    """
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS rev
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(SUM(rev) AS DOUBLE) AS total FROM pr)
    SELECT l_partkey, CAST(rev AS DOUBLE) AS revenue
    FROM pr, tot
    WHERE CAST(rev AS DOUBLE) > 0.0007 * total
    ORDER BY revenue DESC, l_partkey
    """,
    "TPC-H Q11 shape: parts whose revenue exceeds a fraction of GLOBAL "
    "revenue — the scalar subquery sits in the HAVING position. The 1-row "
    "grand total re-aggregates the per-part partials (no second lineitem "
    "scan) and broadcast-cross-joins back; revenue accumulates in DECIMAL "
    "so the threshold compare is bit-identical across engines.",
)
def part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).cast("decimal(38,2)").alias("rev")
    )
    tot = pr.agg(F.sum("rev").cast("double").alias("total"))
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(F.col("rev").cast("double") > 0.0007 * F.col("total"))
        .select(
            "l_partkey", F.col("rev").cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_partkey"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: the canonical 6-table join — local-supplier revenue by
# nation within one region. The join-ordering/broadcast-selection benchmark
# query: two fact-fact equi-joins plus a residual same-nation condition,
# dims broadcast, aggregate on a bounded key.
# ---------------------------------------------------------------------------
@register(
    "nation_revenue_q5",
    """
    SELECT n_name,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                         AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS revenue,
           COUNT(*) AS n_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    "TPC-H Q5 shape: revenue by nation where customer and supplier share "
    "the nation, restricted to one region. Plan: lineitem-orders-customer "
    "chain on uniform keys (AQE picks broadcast vs sort-merge per side), "
    "the same-nation test rides the supplier join as a residual, and "
    "nation/region broadcast with the region filter PUSHED to the scan — "
    "the classic join-reorder benchmark. Revenue uses the Q1 idiom: the "
    "per-row product rounds onto a 1e-6 grid into DECIMAL(28,0) before "
    "the sum, so accumulation order can't show.",
)
def nation_revenue_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("decimal(28,0)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            (F.sum(rev).cast("double") / 1000000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: top unshipped orders by revenue — 3-way join, group on the
# join key, top-N on an aggregate.
# ---------------------------------------------------------------------------
@register(
    "shipping_priority_q3",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                         AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape: revenue of not-yet-shipped lineitems for BUILDING-"
    "segment orders placed before the cutoff, top-10 orders. The segment "
    "filter prunes customer BEFORE its join (predicate pushdown to the "
    "scan), the date filters push to the orders/lineitem scans, the "
    "group key includes the join key so the aggregate is one uniform "
    "l_orderkey shuffle, and ORDER BY + LIMIT compiles to "
    "TakeOrderedAndProject over the aggregate — never a full sort.",
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("decimal(28,0)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev).cast("double") / 1000000).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bilateral volume shipping between two nations by year.
# ---------------------------------------------------------------------------
@register(
    "volume_shipping_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) / 1000000 AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                  AS DECIMAL(28,0)) AS vol
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 shape: shipment revenue between two nations, either "
    "direction, by ship year. Both nation dims BROADCAST twice under "
    "different aliases; the bilateral disjunction rides the second "
    "nation join as a residual over two broadcast-joined name columns, "
    "so the big chain shuffles only on its uniform keys and the final "
    "aggregate groups a 2x2xyears-bounded key space.",
)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    vol = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("decimal(28,0)")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            vol.alias("vol"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("vol").cast("double") / 1000000).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunctive ranges across a join.
# ---------------------------------------------------------------------------
@register(
    "disjunctive_part_revenue_q19",
    """
    SELECT CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                         AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 15
           AND l_quantity BETWEEN 1  AND 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    "TPC-H Q19 shape (adapted to this schema's columns): revenue over a "
    "DISJUNCTION of brand/size/quantity conjunct ranges spanning a join. "
    "The single-side implications factor out and PUSH DOWN — part scans "
    "only the three brands (p_brand IN, p_size <= 50), lineitem scans "
    "only l_quantity BETWEEN 1 AND 50 — while the cross-side residual "
    "evaluates post-join; part broadcasts, so the big side never "
    "shuffles. One-row global aggregate.",
)
def disjunctive_part_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cases = [
        ("Brand#1", 1, 15, 1, 20),
        ("Brand#13", 10, 30, 10, 35),
        ("Brand#20", 20, 50, 20, 50),
    ]
    disj = None
    for brand, s_lo, s_hi, q_lo, q_hi in cases:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        disj = c if disj is None else (disj | c)
    # single-side implications, pushed to the scans explicitly (Catalyst
    # does not factor disjunctions): part reads 3 brands, lineitem reads
    # the quantity hull — the residual disjunction evaluates post-join
    part = part.filter(
        F.col("p_brand").isin([c[0] for c in cases]) & F.col("p_size").between(1, 50)
    )
    li = li.filter(F.col("l_quantity").between(1, 50))
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("decimal(28,0)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(disj)
        .agg(
            (F.sum(rev).cast("double") / 1000000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: IN (grouped HAVING subquery) — aggregate-derived semi join.
# ---------------------------------------------------------------------------
@register(
    "large_volume_customers_q18",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           SUM(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    "TPC-H Q18 shape: customers whose orders exceed 250 total units. The "
    "IN-subquery's per-order SUM is also the outer total_qty (o_orderkey "
    "is unique per group), so lineitem is scanned and aggregated exactly "
    "ONCE: uniform-key partial-agg, HAVING cut to the ~hundreds of "
    "qualifying orders, and that tiny aggregate broadcast-joins orders — "
    "no second lineitem pass, no post-join re-aggregation; top-100 via "
    "TakeOrderedAndProject. total_qty sums integral doubles (< 2^53), so "
    "the sum is exact under any grouping order, cross-engine.",
)
def large_volume_customers_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # ONE lineitem pass (r13): the HAVING subquery's per-order SUM *is*
    # the outer query's total_qty (o_orderkey is unique per group, so
    # re-summing the joined lineitem rows reproduces the same number) —
    # the old semi-join form scanned and shuffled lineitem twice and
    # re-aggregated after the join. Keep the aggregate, filter it to the
    # ~hundreds of qualifying orders, and broadcast THAT to the orders
    # join: lineitem is scanned once, and nothing re-aggregates.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(
            F.broadcast(big), F.col("o_orderkey") == big["l_orderkey"]
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue by customer, top-20.
# ---------------------------------------------------------------------------
@register(
    "returned_item_customers_q10",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                         AS DECIMAL(28,0))) AS DOUBLE) / 1000000 AS revenue,
           n_name, c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1998-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    "TPC-H Q10 shape: revenue lost to returned items per customer over "
    "one order-date year, top-20. The returnflag filter pushes to the "
    "lineitem scan and the date range to the orders scan (both "
    "PushedFilters), nation broadcasts, the aggregate keys on the "
    "customer join key (uniform shuffle), and the top-20 compiles to "
    "TakeOrderedAndProject — the canonical reporting query a warehouse "
    "serves continuously.",
)
def returned_item_customers_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("decimal(28,0)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg((F.sum(rev).cast("double") / 1000000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promotion revenue share for one ship month.
# ---------------------------------------------------------------------------
@register(
    "promo_revenue_q14",
    """
    SELECT CAST(100.0
           * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                   AS DOUBLE))
           / CAST(SUM(rev) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM (
      SELECT CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                  AS DECIMAL(28,0)) AS rev,
             p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-06-01'
        AND l_shipdate <  TIMESTAMP '1997-07-01'
    ) t
    """,
    "TPC-H Q14 shape: percentage of one ship-month's revenue earned by "
    "promotional parts. The month range pushes to the lineitem scan "
    "(PushedFilters prune ~1/80 of the table before the join), the "
    "2-column part dim BROADCASTS, and the CASE rides a single "
    "conditional aggregate — one map-side-combined shuffle of two "
    "partial sums, no second pass for the denominator. Both sums are "
    "exact integer-quantized decimals, so the double ratio is "
    "bit-identical across engines.",
)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("decimal(28,0)")
    zero = F.lit(0).cast("decimal(28,0)")
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(zero).alias("promo"),
        rev.alias("rev"),
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum("promo").cast("double")
            / F.sum("rev").cast("double")
        )
        .cast("double")
        .alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: late lines split by order priority class.
# (The driver tables carry no l_shipmode/l_commitdate; the shape —
# join + residual date predicate + CASE-conditional counts on a tiny
# group key — is preserved on the available columns.)
# ---------------------------------------------------------------------------
@register(
    "late_lines_by_priority_q12",
    """
    SELECT l_linestatus,
           CAST(COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 END) AS BIGINT) AS high_line_count,
           CAST(COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    "TPC-H Q12 shape (adapted: the driver's lineitem has no "
    "l_shipmode/l_commitdate, so the priority-class split groups by "
    "l_linestatus and lateness is shipdate > orderdate + 90d): critical- "
    "vs regular-priority counts among late-shipped lines. The cross-table "
    "date predicate is a JOIN RESIDUAL (not pushable — it references both "
    "sides), both scans project only the 3 columns they contribute "
    "(ReadSchema pruning), and the aggregate collapses onto a 2-value "
    "group key with map-side partials, so the only real shuffle is the "
    "o_orderkey equi-join.",
)
def late_lines_by_priority_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
            ),
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).cast("long").alias("high_line_count"),
            F.count(F.when(~high, 1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: well-funded customers with no orders, by country code.
# ---------------------------------------------------------------------------
@register(
    "untapped_customers_q22",
    """
    WITH pool AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9)
    ),
    avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS a
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM pool, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    "TPC-H Q22 shape (cntrycode = c_nationkey — the driver's customer "
    "has no phone column): customers in 5 target countries whose balance "
    "beats the positive-balance average and who are DORMANT — no order "
    "since the cutoff (the driver's synthetic data gives every customer "
    "at least one all-time order, so the literal never-ordered form "
    "would be a vacuous 0-row check). The "
    "scalar AVG subquery decorrelates to a 1-row aggregate CROSS-joined "
    "back via broadcast (BroadcastNestedLoopJoin over one row — free); "
    "the NOT EXISTS decorrelates to a LEFT ANTI hash join on o_custkey; "
    "the country filter pushes to both customer scans. Orders is never "
    "aggregated — the anti join needs only its key column.",
)
def untapped_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("a")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: one nation's market share inside a region, by year.
# ---------------------------------------------------------------------------
@register(
    "nation_market_share_q8",
    """
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol
                              ELSE 0 END) AS DOUBLE)
                / CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                  AS DECIMAL(28,0)) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    "TPC-H Q8 shape: NATION_2's share of ECONOMY-part revenue sold into "
    "ASIA-region customers, by order year. The deepest join chain in the "
    "suite (7 joins): the part-type filter prunes part to a broadcast "
    "key set that SEMI-reduces lineitem first; nation is broadcast TWICE "
    "under customer-side and supplier-side aliases, region broadcast "
    "once with its name filter pushed; numerator and denominator ride "
    "ONE conditional aggregate over a years-bounded group key. Exact "
    "integer-quantized volumes make the share ratio engine-identical.",
)
def nation_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("decimal(28,0)")
    zero = F.lit(0).cast("decimal(28,0)")
    rows = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"), "left_semi")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.when(F.col("supp_nation") == "NATION_2", vol)
            .otherwise(zero)
            .alias("nvol"),
            vol.alias("vol"),
        )
    )
    return (
        rows.groupBy("o_year")
        .agg(
            (
                F.sum("nvol").cast("double") / F.sum("vol").cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: the supplier(s) with the maximum one-year revenue.
# ---------------------------------------------------------------------------
@register(
    "top_supplier_revenue_q15",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000)
                      AS DECIMAL(28,0))) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total AS DOUBLE) / 1000000 AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total = (SELECT MAX(total) FROM revenue)
    ORDER BY s_suppkey
    """,
    "TPC-H Q15 shape: the top supplier by one ship-year's revenue (all "
    "of them on a tie — exact DECIMAL totals make the equality "
    "deterministic, where float totals would drop ties to ulps). The "
    "view's aggregate is computed ONCE and reused for both the scalar "
    "MAX and the equality filter (ReusedExchange, the Q11 recipe); the "
    "1-row MAX broadcasts back, and the surviving ~1-row winner set "
    "broadcasts into the supplier name join — the big lineitem table is "
    "scanned exactly once, with the year range pushed to the scan.",
)
def top_supplier_revenue_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        # written explicitly so BOTH consumers of `revenue` (the scalar
        # MAX and the equality filter) canonicalize to the same subtree:
        # without it the winner branch's equi-join infers
        # IsNotNull(l_suppkey) onto only ITS scan and the exchange can't
        # be reused (lineitem would be scanned + partially aggregated
        # twice). Vacuous on TPC-H data (l_suppkey is never null).
        & F.col("l_suppkey").isNotNull()
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000
    ).cast("decimal(28,0)")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total")
    )
    max_total = revenue.agg(F.max("total").alias("mx"))
    winners = revenue.join(
        F.broadcast(max_total), F.col("total") == F.col("mx")
    ).select("supplier_no", "total")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(
            F.broadcast(winners), F.col("s_suppkey") == F.col("supplier_no")
        )
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total").cast("double") / 1000000).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# Registration complete for this module — trigger the driver-window reorder
# (no-op until the LAST registering module finishes; see inventory.py).
from .inventory import _maybe_reorder_registry  # noqa: E402

_maybe_reorder_registry()
