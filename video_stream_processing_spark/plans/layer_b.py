"""Layer B — the relational/analytic operator surface (SURVEY.md §2.5).

The reference implements none of these (grep-verified: no joins, aggs,
window functions, sorts or set ops anywhere in its Java); they are the
query surface its Doris fact table exists to serve — DUPLICATE KEY +
bitmap indexes on (detection_time, object_class) imply time-range and
class-predicate scans, group-bys and rollups (reference README.md:81-105).
Each operator is a declared query on the star schema with a DuckDB oracle.

Float-parity conventions (see plans/registry.py):
  - 2-decimal money doubles aggregate as DECIMAL(18,2) then cast DOUBLE;
  - intrinsically floating results round to a fixed scale on both sides;
  - integer-ish results cast to the Spark output type in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from video_stream_processing_spark.plans.registry import register
from video_stream_processing_spark.tables import load_table, register_temp_views


def _dec(col, scale: int = 2):
    """Exact-sum representation for 2-decimal money doubles."""
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------------
# b01 — hash aggregate with grouped full-table scan (TPC-H Q1 shape: the
# pricing summary the Doris fact table's returnflag/linestatus slicing maps to)
# --------------------------------------------------------------------------


@register(
    "b01_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("layer_b", "aggregate"),
)
def b01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped scan aggregate: map-side partial aggregation + one shuffle
    on the (low-cardinality) group key; decimals keep sums order-exact."""
    from video_stream_processing_spark.operators.parallelism import (
        ensure_parallelism,
    )

    # spread the one-split test scan: the decimal multiply-sum chain is
    # genuinely compute-heavy per row and percentile/decimal partials
    # serialized on the lone scan task (measured 1.9 -> 1.5 s median;
    # exact decimals are order-independent). No-op at real scale.
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    charge = disc_price * (F.lit(1) + F.col("l_tax")).cast("decimal(18,2)")
    cnt = F.count(F.lit(1))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# b02 — global sort / top-k (takeOrdered physical path)
# --------------------------------------------------------------------------


@register(
    "b02_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("layer_b", "sort_limit"),
)
def b02_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT: Catalyst plans TakeOrderedAndProject — per-
    partition top-k then a single-reduce merge, no global sort shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(25).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


# --------------------------------------------------------------------------
# b03 — broadcast equi-join (small dim x big fact)
# --------------------------------------------------------------------------


@register(
    "b03_broadcast_join",
    oracle="""
SELECT p.p_type,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS line_count
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 15
GROUP BY p.p_type
""",
    tags=("layer_b", "join"),
)
def b03_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the part dim: at 100 TB the fact side never
    shuffles for this join — the dim ships to every executor."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 15)
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("line_count"))
    )


# --------------------------------------------------------------------------
# b04 — multi-way join through the full snowflake (shuffle + broadcast mix)
# --------------------------------------------------------------------------


@register(
    "b04_snowflake_join",
    oracle="""
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY n.n_name
""",
    tags=("layer_b", "join"),
)
def b04_snowflake_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region->nation->customer broadcast down onto orders⋈lineitem (the
    only genuinely large join, shuffled on orderkey; AQE picks broadcast
    for the dims from runtime sizes)."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)), c.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# b05/b06 — semi and anti joins
# --------------------------------------------------------------------------


@register(
    "b05_semi_join",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    tags=("layer_b", "join"),
)
def b05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers having at least one big order — no
    duplication of the left side, right side reduced to existence bits."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "b06_anti_join",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
""",
    tags=("layer_b", "join"),
)
def b06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no event activity (the event-stream
    key space is a strict subset of the customer key space, so this is
    non-empty at every scale factor)."""
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")
    return c.join(e, c.c_custkey == e.user_id, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# b07 — distinct aggregates
# --------------------------------------------------------------------------


@register(
    "b07_count_distinct",
    oracle="""
SELECT o_orderpriority,
       count(*) AS order_count,
       count(DISTINCT o_custkey) AS distinct_customers,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY o_orderpriority
""",
    tags=("layer_b", "aggregate"),
)
def b07_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) beside plain aggregates — Catalyst's two-phase
    expand+aggregate; at scale prefer approx_count_distinct (b08)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_value"),
    )


@register("b08_approx_count_distinct", oracle=None, tags=("layer_b", "aggregate", "rows_only"))
def b08_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the scale path for distinct
    metrics over 100 TB (single pass, fixed memory, no expand shuffle).
    Sketch internals differ from DuckDB's approx_distinct, so rows-only;
    tests/test_layer_b.py bounds the relative error against exact."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_distinct_customers")
    )


# --------------------------------------------------------------------------
# b09/b10/b11 — rollup, cube, grouping sets
# --------------------------------------------------------------------------


@register(
    "b09_rollup",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       count(*) AS customer_count,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    tags=("layer_b", "aggregate"),
)
def b09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "c_acctbal")
        .rollup("region", "nation")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_balance"),
        )
    )


@register(
    "b10_cube",
    oracle="""
SELECT event_type, CAST(user_id % 5 AS BIGINT) AS user_bucket,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY CUBE (event_type, user_bucket)
""",
    tags=("layer_b", "aggregate"),
)
def b10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 4 grouping combinations."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_type", (F.col("user_id") % 5).alias("user_bucket"), "value")
        .cube("event_type", "user_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("value_sum"),
        )
    )


@register(
    "b11_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
    tags=("layer_b", "aggregate"),
)
def b11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (expressed via Spark SQL — same Catalyst
    Expand operator the DataFrame rollup/cube lower to)."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


# --------------------------------------------------------------------------
# b12-b15 — window functions (ranking, lag/lead, top-k per group, running)
# --------------------------------------------------------------------------


@register(
    "b12_window_rank",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal,
       CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
       CAST(rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS BIGINT) AS drnk
FROM customer
""",
    tags=("layer_b", "window_fn"),
)
def b12_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over per-segment balance ordering.
    Spark emits int for these; cast the oracle to match Spark's IntegerType
    (pandas dtype parity), then upcast both to long via column cast."""
    c = load_table(spark, sf_dir, "customer")
    w_unique = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_ties = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w_unique).cast("long").alias("rn"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
    )


@register(
    "b13_window_lag_lead",
    oracle="""
SELECT user_id, ts, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       CAST(round(value - COALESCE(lag(value) OVER w, value), 2) AS DOUBLE) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("layer_b", "window_fn"),
)
def b13_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation over per-key event-time order (the analytic
    shape behind the keyframe gate and sessionization)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.col("value")), 2
        ).cast("double").alias("delta"),
    )


@register(
    "b14_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn <= 3
""",
    tags=("layer_b", "window_fn"),
)
def b14_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number + filter. At scale this is
    the shuffle-once pattern (vs a self-join or per-group sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "b15_running_sum",
    oracle="""
SELECT user_id, ts, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
       CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_count
FROM events
""",
    tags=("layer_b", "window_fn"),
)
def b15_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-key running aggregates with an explicit ROWS frame
    (decimal accumulation keeps the prefix sums order-exact)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).cast("long").alias("running_count"),
    )


# --------------------------------------------------------------------------
# b16 — set operations (union distinct / intersect / except in one result)
# --------------------------------------------------------------------------


@register(
    "b16_set_ops",
    oracle="""
WITH order_cust AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000),
     event_cust AS (SELECT DISTINCT user_id AS custkey FROM events)
SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM order_cust INTERSECT SELECT custkey FROM event_cust)
UNION ALL
SELECT 'except' AS op, custkey FROM (SELECT custkey FROM order_cust EXCEPT SELECT custkey FROM event_cust)
UNION ALL
SELECT 'union' AS op, custkey FROM (SELECT custkey FROM order_cust UNION SELECT custkey FROM event_cust)
""",
    tags=("layer_b", "set_ops"),
)
def b16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION(distinct) over two key sets, tagged and
    stacked so one declared query covers all three physical set-op plans."""
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    a = o.where(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey")).distinct()
    b = e.select(F.col("user_id").alias("custkey")).distinct()
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "custkey")  # noqa: E731
    return (
        tag(a.intersect(b), "intersect")
        .unionAll(tag(a.subtract(b), "except"))
        .unionAll(tag(a.union(b).distinct(), "union"))
    )


# --------------------------------------------------------------------------
# b17-b20 — scalar function coverage (string / date / math / JSON)
# --------------------------------------------------------------------------


@register(
    "b17_string_functions",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       CAST(length(p_name) AS INT) AS name_len,
       substring(p_name, 1, 8) AS name_prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
       trim(p_name) AS name_trim,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_consonants,
       reverse(p_brand) AS brand_rev,
       CAST(strpos(p_type, 'O') AS INT) AS first_o,
       replace(p_type, 'ECONOMY', 'ECO') AS type_short
FROM part
""",
    tags=("layer_b", "scalar_fn"),
)
def b17_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function surface. DuckDB regexp_replace needs the 'g'
    flag to match Spark's replace-all default; Spark instr == DuckDB strpos."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.trim("p_name").alias("name_trim"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_consonants"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_type", "O").alias("first_o"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
    )


@register(
    "b18_date_functions",
    oracle="""
SELECT o_orderkey, o_orderdate,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(day(o_orderdate) AS INT) AS order_day,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,
       CAST(quarter(o_orderdate) AS INT) AS order_quarter,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_95,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m
FROM orders
WHERE o_orderkey % 7 = 0
""",
    tags=("layer_b", "scalar_fn"),
)
def b18_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface. Parity traps handled: DuckDB dayofweek is
    0-based (Spark 1-based, so oracle adds 1); Spark add_months == DuckDB
    +INTERVAL MONTH (both clamp to month end)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
    )


@register(
    "b19_math_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000.0) AS abs_dev,
       l_extendedprice / 1000.0 AS price_k,
       CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_div7,
       CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_div7_up,
       sqrt(l_quantity) AS qty_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(exp(l_discount), 6) AS disc_exp,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       CAST(l_partkey % 97 AS BIGINT) AS partkey_mod,
       greatest(l_discount, l_tax) AS max_rate,
       least(l_discount, l_tax) AS min_rate,
       round(pow(l_quantity, 2), 2) AS qty_sq
FROM lineitem
WHERE l_orderkey % 11 = 0
""",
    tags=("layer_b", "scalar_fn"),
)
def b19_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface. Transcendentals (ln/exp) round to 6 — libm
    implementations may differ in the last ulp between JVM and DuckDB;
    sqrt is IEEE-exact so left unrounded."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 11 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        (F.col("l_extendedprice") / 1000.0).alias("price_k"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_div7"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_div7_up"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        (F.col("l_partkey") % 97).alias("partkey_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
    )


@register(
    "b20_json_functions",
    oracle="""
SELECT event_id, props,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
       CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
WHERE event_type IN ('purchase', 'signup')
""",
    tags=("layer_b", "scalar_fn"),
)
def b20_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props payload (the reference's frame
    metadata analog, FrameMetadata at VideoFrame.java:49)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type").isin("purchase", "signup"))
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        "props",
        k.alias("k_value"),
        (k % 10).alias("k_mod"),
        F.when(k >= 50, "high").otherwise("low").alias("k_band"),
    )


# --------------------------------------------------------------------------
# b21 — array functions (embedding vector column, scalar projections)
# --------------------------------------------------------------------------


@register(
    "b21_array_functions",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_val,
       round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_val,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
""",
    tags=("layer_b", "array_fn"),
)
def b21_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface over the embedding column: size/element_at/min/max and
    a higher-order-function fold (JVM-side, no Python) for the L2 norm —
    the building blocks of the similarity-search operators (x06+)."""
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
    )


# --------------------------------------------------------------------------
# b22 — sessionization via lag + cumulative sum (gap-based)
# --------------------------------------------------------------------------


@register(
    "b22_sessionization",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("layer_b", "window_fn", "sessionization"),
)
def b22_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag -> new-session flag ->
    running sum as session id -> per-session aggregate. Single shuffle on
    user_id reused by both window specs and the final groupBy."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | (F.unix_millis(F.col("ts")) - F.unix_millis(prev_ts) > 1_800_000), 1
    ).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wcum).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
    )


# --------------------------------------------------------------------------
# b23/b24/b25 — event-time windows: tumbling, sliding, session
# --------------------------------------------------------------------------


@register(
    "b23_tumbling_window",
    oracle="""
SELECT make_timestamp((epoch_ms(ts) // 1000 // 3600) * 3600 * 1000000) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
    tags=("layer_b", "window_agg"),
)
def b23_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling event-time windows (same F.window the streaming
    mode uses with a watermark — batch and stream share this expression)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "3600 seconds").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events", "value_sum"
        )
    )


@register(
    "b24_sliding_window",
    oracle="""
SELECT make_timestamp(((epoch_ms(ts) // 1000 // 300) * 300 - o.off) * 1000000) AS window_start,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events
CROSS JOIN (SELECT unnest([0, 300]) AS off) o
GROUP BY 1
""",
    tags=("layer_b", "window_agg"),
)
def b24_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): every event lands in
    exactly two windows; Spark's window() does the expansion internally
    (the oracle materializes the same two bucket starts explicitly)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "600 seconds", "300 seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "value_sum")
    )


@register(
    "b25_session_window",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM sessions
GROUP BY user_id, sid
""",
    tags=("layer_b", "window_agg"),
)
def b25_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window (30 min gap): Spark merges adjacent events
    into variable-length sessions; end = last event + gap. The oracle
    reproduces it with the lag/cumsum construction (b22) — semantics match
    exactly for gap-close sessions."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# b26 — pivot (group -> columns)
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_B26_ORACLE = "SELECT user_id, " + ", ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS ev_{t}" for t in _EVENT_TYPES
) + " FROM events GROUP BY user_id"


@register("b26_pivot", oracle=_B26_ORACLE, tags=("layer_b", "pivot"))
def b26_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event counts per user into one column per event type. Explicit
    value list (no discovery pass — required at scale); missing combos
    coalesce to 0 to match SQL FILTER counts."""
    e = load_table(spark, sf_dir, "events")
    pivoted = (
        e.groupBy("user_id").pivot("event_type", list(_EVENT_TYPES)).agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"ev_{t}") for t in _EVENT_TYPES],
    )


# --------------------------------------------------------------------------
# b27 — percentiles (exact interpolated)
# --------------------------------------------------------------------------


@register(
    "b27_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
       round(quantile_cont(l_quantity, 0.5), 4) AS qty_median,
       round(quantile_cont(l_quantity, 0.9), 4) AS qty_p90,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS price_median
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("layer_b", "aggregate"),
)
def b27_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark percentile == DuckDB
    quantile_cont). At 100 TB the approx_percentile sketch replaces this
    shape; kept exact here for oracle parity."""
    from video_stream_processing_spark.operators.parallelism import (
        ensure_parallelism,
    )

    # spread the one-split scan: exact percentile partials BUFFER every
    # value (no map-side reduction), so building them serialized on the
    # lone scan task (measured 1.5 -> 1.0 s median; the interpolation is
    # partition-order independent). No-op at real scale.
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("qty_p25"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("qty_median"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("qty_p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("price_median"),
    )


# --------------------------------------------------------------------------
# b28 — arg-max/arg-min (max_by/min_by with a deterministic tiebreak)
# --------------------------------------------------------------------------


@register(
    "b28_arg_extrema",
    oracle="""
SELECT o_custkey,
       arg_max(o_orderkey, CAST(o_totalprice * 100 AS BIGINT) * 100000000 + o_orderkey) AS best_order,
       arg_min(o_orderkey, CAST(o_totalprice * 100 AS BIGINT) * 100000000 + o_orderkey) AS worst_order,
       CAST(max(o_totalprice) AS DOUBLE) AS best_price
FROM orders
GROUP BY o_custkey
""",
    tags=("layer_b", "aggregate"),
)
def b28_arg_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with a composed (price, key) rank value so ties on
    price resolve deterministically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    rank_val = (F.col("o_totalprice") * 100).cast("long") * F.lit(100_000_000) + F.col(
        "o_orderkey"
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", rank_val).alias("best_order"),
        F.min_by("o_orderkey", rank_val).alias("worst_order"),
        F.max("o_totalprice").cast("double").alias("best_price"),
    )


# --------------------------------------------------------------------------
# b29 — statistical aggregates
# --------------------------------------------------------------------------


@register(
    "b29_statistical_aggs",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS qty_stddev,
       round(var_samp(l_quantity), 4) AS qty_var,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("layer_b", "aggregate"),
)
def b29_statistical_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/corr/covar — float-accumulation order differs
    between engines, so rounded on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
    )


# --------------------------------------------------------------------------
# b30 — conditional aggregation (CASE inside aggregates)
# --------------------------------------------------------------------------


@register(
    "b30_conditional_agg",
    oracle="""
SELECT c_mktsegment,
       count(*) FILTER (WHERE c_acctbal > 5000) AS rich_customers,
       count(*) FILTER (WHERE c_acctbal < 0) AS debtors,
       CAST(sum(CASE WHEN c_acctbal > 0 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS positive_balance
FROM customer
GROUP BY c_mktsegment
""",
    tags=("layer_b", "aggregate"),
)
def b30_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: filtered counts and CASE-guarded sums."""
    c = load_table(spark, sf_dir, "customer")
    dec0 = F.lit(0).cast("decimal(18,2)")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("c_acctbal") > 5000, 1)).alias("rich_customers"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("debtors"),
        F.sum(
            F.when(F.col("c_acctbal") > 0, F.col("c_acctbal").cast("decimal(18,2)")).otherwise(dec0)
        ).cast("double").alias("positive_balance"),
    )


# --------------------------------------------------------------------------
# b31 — correlated subquery (decorrelated by Catalyst into a join)
# --------------------------------------------------------------------------


@register(
    "b31_correlated_subquery",
    oracle="""
WITH cust_avg AS (
    SELECT o_custkey AS k,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
    FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o JOIN cust_avg a ON o.o_custkey = a.k
WHERE o.o_totalprice > a.avg_price * 1.5
""",
    tags=("layer_b", "subquery"),
)
def b31_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders 50% above their customer's average — written as a correlated
    scalar subquery in Spark SQL (Catalyst decorrelates it into the same
    aggregate+join the oracle spells out)."""
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (
            SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 1.5
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


# --------------------------------------------------------------------------
# b32 — distinct projection
# --------------------------------------------------------------------------


@register(
    "b32_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("layer_b", "aggregate"),
)
def b32_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — hash-aggregate dedup on the projected columns."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


# --------------------------------------------------------------------------
# b33/b34 — time-series joins Spark lacks native operators for: as-of and
# range, composed from built-ins (operators/joins.py)
# --------------------------------------------------------------------------


@register(
    "b33_asof_join",
    oracle="""
WITH o AS (
    SELECT o_custkey AS k, o_orderdate AS t,
           max(o_orderkey) AS o_orderkey,
           max_by(o_totalprice, o_orderkey) AS o_totalprice
    FROM orders GROUP BY 1, 2
)
SELECT e.user_id, e.ts, e.event_id, o.o_orderkey, o.o_totalprice
FROM events e ASOF JOIN o ON e.user_id = o.k AND e.ts >= o.t
""",
    tags=("layer_b", "join", "asof"),
)
def b33_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (most recent order state at event time) via the
    union-scan + last_value(ignoreNulls) composition — one shuffle on the
    key, no theta join (operators/joins.py:asof_join). Orders deduped to
    one per (custkey, date) (max orderkey) so the as-of pick is unique.
    Oracle: DuckDB's native ASOF JOIN."""
    from video_stream_processing_spark.operators.joins import asof_join

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("t"))
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", F.col("o_orderkey")).alias("o_totalprice"),
        )
    )
    return asof_join(
        e, o, key="user_id", left_ts="ts", right_ts="t",
        value_cols=("o_orderkey", "o_totalprice"),
    ).select("user_id", "ts", "event_id", "o_orderkey", "o_totalprice")


@register(
    "b34_range_join",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       ((epoch_ms(p.ts) - epoch_ms(c.ts) + 3) // 6) / 10000.0 AS mins_apart
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts
 AND epoch_ms(p.ts) - epoch_ms(c.ts) <= 3600000
 AND p.event_id != c.event_id
""",
    tags=("layer_b", "join", "range"),
)
def b34_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (attribution: each purchase matched to same-user clicks
    in the preceding hour) rewritten as a tolerance-bucket equi-join +
    exact predicate — bounded-fanout hash join instead of the
    nested-loop a raw inequality produces
    (operators/joins.py:range_join_bucketed).

    mins_apart is rounded to 4 dp IN INTEGER MILLISECONDS —
    (delta_ms + 3) div 6, i.e. half-up of delta_ms/6 — then scaled by
    /1e4 as the final double. round(delta_ms / 60000.0, 4) was
    cross-engine-unstable at true half-ties: at sf0.1 three cells hit
    exact X.XXXX5 minutes, where Spark's Round (shortest-decimal
    HALF_UP) said .XXX2 and DuckDB (binary-double round) said .XXX1.
    Integer division on the exact millisecond delta is tie-free in both
    engines (the x131 micro-unit discipline)."""
    from video_stream_processing_spark.operators.joins import range_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    joined = range_join_bucketed(
        p, c, key="user_id", left_ts="ts", right_ts="click_ts", tolerance_ms=3_600_000
    )
    return (
        joined.where(
            (F.col("click_ts") <= F.col("ts")) & (F.col("purchase_id") != F.col("click_id"))
        )
        .withColumn(
            "delta_ms", F.unix_millis(F.col("ts")) - F.unix_millis(F.col("click_ts"))
        )
        .select(
            "purchase_id",
            "click_id",
            (F.expr("(delta_ms + 3) div 6") / F.lit(10000.0)).alias("mins_apart"),
        )
    )


# --------------------------------------------------------------------------
# b35-b38 — map functions, skew-salted join, hash sampling, posexplode
# --------------------------------------------------------------------------


@register(
    "b35_map_functions",
    oracle="""
SELECT p_partkey,
       element_at(MAP {'brand': p_brand, 'type': p_type, 'size': CAST(p_size AS VARCHAR)}, 'brand')[1] AS brand_val,
       CAST(cardinality(MAP {'brand': p_brand, 'type': p_type, 'size': CAST(p_size AS VARCHAR)}) AS INT) AS n_keys,
       array_to_string(map_keys(MAP {'brand': p_brand, 'type': p_type, 'size': CAST(p_size AS VARCHAR)}), ',') AS key_list,
       array_to_string(map_values(MAP {'brand': p_brand, 'type': p_type, 'size': CAST(p_size AS VARCHAR)}), '|') AS val_list
FROM part
WHERE p_partkey % 13 = 0
""",
    tags=("layer_b", "scalar_fn", "map_fn"),
)
def b35_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map scalar-function surface: construct, element_at, size,
    map_keys/map_values (insertion order preserved in both engines)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") % 13 == 0)
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("type"), F.col("p_type"),
        F.lit("size"), F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.size(m).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.array_join(F.map_values(m), "|").alias("val_list"),
    )


@register(
    "b36_salted_join",
    oracle="""
SELECT c.c_mktsegment, count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    tags=("layer_b", "join", "skew"),
)
def b36_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted shuffle join: the fact side appends salt = event_id % 8,
    the dim side explodes into all 8 salts, and the join key becomes
    (key, salt) — a hot key's rows spread over 8 reducers instead of one.
    Results are identical to the plain join (the oracle IS the plain
    join); AQE's skew handling makes this optional but the rewrite is the
    portable form at 100 TB."""
    salt_n = 8
    e = load_table(spark, sf_dir, "events").withColumn(
        "salt", (F.col("event_id") % salt_n).cast("int")
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return (
        e.join(c, (e.user_id == c.c_custkey) & (e.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


@register(
    "b37_hash_sample",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
""",
    tags=("layer_b", "sampling"),
)
def b37_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% hash sample (md5 prefix < 0x1a ~= 26/256):
    reproducible across engines/runs/partitionings, unlike rand()-based
    Bernoulli sampling — the sane way to sample consistently at scale."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "b38_posexplode",
    oracle=r"""
SELECT doc_id, CAST(u.i - 1 AS INT) AS pos, u.x AS token
FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents WHERE doc_id % 25 = 0),
     unnest(list_transform(toks, (x, i) -> {'i': i, 'x': x})) AS t(u)
""",
    tags=("layer_b", "explode"),
)
def b38_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (position-preserving flatten) — 0-based positions; the
    oracle's 1-based lambda index is shifted to match."""
    from video_stream_processing_spark.operators.text import tokens_col

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    return d.select("doc_id", F.posexplode(tokens_col()).alias("pos", "token"))


# --------------------------------------------------------------------------
# b39-b41 — multiset set-ops, null semantics, range window frames
# --------------------------------------------------------------------------


@register(
    "b39_multiset_ops",
    oracle="""
WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45),
     b AS (SELECT s_suppkey AS k FROM supplier)
SELECT 'intersect_all' AS op, k FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
UNION ALL
SELECT 'except_all' AS op, k FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
""",
    tags=("layer_b", "set_ops"),
)
def b39_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) —
    duplicate-preserving counterparts of b16."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    a = li.where(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("k"))
    b = s.select(F.col("s_suppkey").alias("k"))
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "k")  # noqa: E731
    return tag(a.intersectAll(b), "intersect_all").unionAll(
        tag(a.exceptAll(b), "except_all")
    )


@register(
    "b40_null_semantics",
    oracle="""
SELECT event_id,
       COALESCE(json_extract_string(props, '$.missing'), 'absent') AS with_default,
       NULLIF(event_type, 'click') AS click_nulled,
       CAST(json_extract_string(props, '$.k') AS INT) IS NOT DISTINCT FROM 50 AS nullsafe_eq_50,
       CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 'no_k' ELSE 'has_k' END AS k_presence,
       ifnull(CAST(json_extract_string(props, '$.k') AS INT), -1) AS k_or_neg1
FROM events
WHERE event_id % 17 = 0
""",
    tags=("layer_b", "scalar_fn", "null_semantics"),
)
def b40_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: coalesce, nullif, null-safe equality (<=>
    == IS NOT DISTINCT FROM), null predicates, ifnull."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 17 == 0)
    k = F.get_json_object("props", "$.k").cast("int")
    missing = F.get_json_object("props", "$.missing")
    return e.select(
        "event_id",
        F.coalesce(missing, F.lit("absent")).alias("with_default"),
        F.nullif(F.col("event_type"), F.lit("click")).alias("click_nulled"),
        k.eqNullSafe(F.lit(50)).alias("nullsafe_eq_50"),
        F.when(missing.isNull() & k.isNull(), "no_k")
        .when(k.isNull(), "no_k")
        .otherwise("has_k")
        .alias("k_presence"),
        F.ifnull(k, F.lit(-1)).alias("k_or_neg1"),
    )


@register(
    "b41_range_frame_window",
    oracle="""
SELECT user_id, ts, value,
       CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
""",
    tags=("layer_b", "window_fn"),
)
def b41_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (trailing 1-hour per-key aggregates ordered by
    event time) — value-based frames, the time-series moving-aggregate
    shape; ROWS frames are b15."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis(F.col("ts")))
        .rangeBetween(-3_600_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "ts",
        "value",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_last_hour"),
    )


# --------------------------------------------------------------------------
# b42/b43 — composite query shapes (multi-operator plans)
# --------------------------------------------------------------------------


@register(
    "b42_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    tags=("layer_b", "composite"),
)
def b42_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast onto a two-fact
    join, grouped revenue, global top-10 (TakeOrderedAndProject) — the
    canonical composite plan: every filter is pushed, only the
    lineitem⋈orders edge shuffles."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "b43_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type,
       count(DISTINCT l.l_suppkey) AS supplier_cnt,
       count(*) AS line_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size IN (1, 5, 15, 25)
  AND NOT EXISTS (SELECT 1 FROM supplier s
                  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
GROUP BY p.p_brand, p.p_type
""",
    tags=("layer_b", "composite"),
)
def b43_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: anti join (exclude negative-balance suppliers)
    under a broadcast dim filter, then distinct-count aggregation —
    anti-join + expand in one plan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size").isin(1, 5, 15, 25))
    bad_s = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(bad_s, li.l_suppkey == bad_s.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@register("b44_approx_percentile", oracle=None, tags=("layer_b", "aggregate", "rows_only"))
def b44_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch, accuracy 100) —
    the single-pass fixed-memory replacement for exact interpolated
    percentiles (b27) at 100 TB. Sketch differs from DuckDB's t-digest
    => rows-only; tests/test_layer_b.py bounds the error vs exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.5), F.lit(100)).alias("qty_median_approx"),
        F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(100)).alias("price_p90_approx"),
    )


@register(
    "b45_ordered_list_agg",
    oracle="""
SELECT o_custkey,
       array_to_string(list(CAST(o_orderkey AS VARCHAR) ORDER BY o_orderkey), ',') AS order_keys,
       count(*) AS n_orders
FROM orders
GROUP BY o_custkey
""",
    tags=("layer_b", "aggregate", "list_agg"),
)
def b45_ordered_list_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (collect_list -> sort_array -> join):
    deterministic despite collect_list's arrival-order nondeterminism —
    the portable pattern for per-key sequence materialization."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.sort_array(F.collect_list(F.col("o_orderkey"))).cast("array<string>"), ","
        ).alias("order_keys"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "b46_first_last_nth",
    oracle="""
SELECT user_id, ts, event_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
       nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("layer_b", "window_fn"),
)
def b46_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value navigation (full-partition
    frames for last/nth so results are frame-complete, not running)."""
    e = load_table(spark, sf_dir, "events")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w_run.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "ts",
        "event_id",
        F.first("event_type").over(w_run).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
        F.nth_value("event_type", 2).over(w_full).alias("second_type"),
    )


@register(
    "b47_ntile_distribution",
    oracle="""
WITH w0 AS (
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           CAST(round(percent_rank() OVER w * (count(*) OVER p - 1)) AS BIGINT) AS j,
           CAST(round(cume_dist() OVER w * count(*) OVER p) AS BIGINT) AS k,
           count(*) OVER p AS n
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
           p AS (PARTITION BY c_nationkey)
)
SELECT c_custkey, c_nationkey, c_acctbal, quartile,
       CAST((2 * j * 1000000 + greatest(n - 1, 1)) // (2 * greatest(n - 1, 1)) AS BIGINT) AS pct_rank_e6,
       CAST((2 * k * 1000000 + n) // (2 * n) AS BIGINT) AS cume_e6
FROM w0
""",
    tags=("layer_b", "window_fn"),
)
def b47_ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile(4) quartile bucketing,
    percent_rank, cume_dist per nation ordered by balance. Ties broken
    on c_custkey so every rank-derived value is engine-deterministic.

    pct_rank/cume are reported as HALF-UP MICRO-UNIT INTEGERS
    (pct_rank_e6 / cume_e6): the window function's double is first
    recovered to its exact integer numerator (round(cume_dist * n) = k
    — the recovery is exact because the double sits within eps of k/n
    and eps*n << 0.5), then rounded to 6 dp entirely in integer
    arithmetic ((2*k*1e6 + n) div (2*n)). round(cume_dist(), 6) was
    cross-engine-unstable at true half-ties: at sf0.1 three cells hit
    an exact X.XXXXXX5 rational, where Spark's Round
    (shortest-decimal HALF_UP) and DuckDB (binary-double round)
    disagree by 1e-6 — the x131 micro-unit discipline applied to
    window ratios. The window functions themselves are still what is
    certified: every output is derived from their values."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    p = Window.partitionBy("c_nationkey")
    n = F.count(F.lit(1)).over(p)
    j = F.round(F.percent_rank().over(w) * (n - 1)).cast("long")
    k = F.round(F.cume_dist().over(w) * n).cast("long")
    d = F.greatest(n - 1, F.lit(1))
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.ntile(4).over(w).cast("int").alias("quartile"),
            (2 * j * 1000000 + d.cast("long")).alias("_pnum"),
            (2 * d.cast("long")).alias("_pden"),
            (2 * k * 1000000 + n.cast("long")).alias("_cnum"),
            (2 * n.cast("long")).alias("_cden"),
        )
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            "quartile",
            F.expr("_pnum div _pden").alias("pct_rank_e6"),
            F.expr("_cnum div _cden").alias("cume_e6"),
        )
    )


@register(
    "b48_merge_upsert",
    oracle="""
WITH changes AS (
    SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice, 'U' AS op
    FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 != 3
    UNION ALL
    SELECT -o_orderkey, o_custkey, o_totalprice, 'I' AS op
    FROM orders WHERE o_orderkey % 13 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice, 'D' AS op
    FROM orders WHERE o_orderkey % 11 = 3
)
SELECT coalesce(c.o_orderkey, b.o_orderkey) AS o_orderkey,
       coalesce(c.o_custkey, b.o_custkey) AS o_custkey,
       coalesce(c.o_totalprice, b.o_totalprice) AS o_totalprice,
       CASE WHEN c.op = 'I' THEN 'insert'
            WHEN c.op = 'U' THEN 'update'
            ELSE 'base' END AS src
FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
WHERE c.op IS NULL OR c.op != 'D'
""",
    tags=("layer_b", "merge"),
)
def b48_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / CDC-apply as a batch query: a deterministic changes feed
    (updates for key%7, inserts at -key for key%13 — negated keys are
    disjoint from the positive base keyspace at any scale factor, deletes
    for key%11==3) applied onto the base table with one full-outer join —
    change side wins, deletes drop. The Doris DUPLICATE KEY sink the
    reference writes to implies exactly this mutable-fact maintenance;
    at scale the join shuffles on the merge key once (or colocates if
    both sides are bucketed on it), and the update arithmetic (*2) is
    FP-exact so both engines agree bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select("o_orderkey", "o_custkey", "o_totalprice")
    updates = (
        base.where((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 11 != 3))
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            F.lit("U").alias("op"),
        )
    )
    inserts = base.where(F.col("o_orderkey") % 13 == 0).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
        F.lit("I").alias("op"),
    )
    deletes = base.where(F.col("o_orderkey") % 11 == 3).select(
        "o_orderkey", "o_custkey", "o_totalprice", F.lit("D").alias("op")
    )
    changes = updates.unionByName(inserts).unionByName(deletes)
    b = base.alias("b")
    c = changes.alias("c")
    merged = b.join(c, F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
    return merged.where(
        F.col("c.op").isNull() | (F.col("c.op") != "D")
    ).select(
        F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("c.o_custkey"), F.col("b.o_custkey")).alias("o_custkey"),
        F.coalesce(F.col("c.o_totalprice"), F.col("b.o_totalprice")).alias("o_totalprice"),
        F.when(F.col("c.op") == "I", "insert")
        .when(F.col("c.op") == "U", "update")
        .otherwise("base")
        .alias("src"),
    )


@register(
    "b49_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, value FROM (
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
    FROM lineitem WHERE l_orderkey % 100 = 0
) UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
""",
    tags=("layer_b", "reshape"),
)
def b49_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse reshape of b26's pivot: four measure
    columns become (metric, value) rows. Narrow map-side transform (an
    Expand node, 4 output rows per input, no shuffle); UNPIVOT in both
    engines drops NULL measures by default, same semantics."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "b50_customer_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    tags=("layer_b", "composite"),
)
def b50_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — double aggregation over an outer join with a
    join-side (not WHERE-side) predicate: customers-per-order-count
    histogram. The left join preserves order-less customers (c_count=0);
    the second aggregate runs over the first's tiny output, so only the
    customer⋈orders edge shuffles at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "b51_supplier_share_semijoin",
    oracle="""
WITH pair AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
    FROM lineitem GROUP BY l_partkey, l_suppkey
), tot AS (
    SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS tq
    FROM lineitem GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT pair.l_suppkey
    FROM pair
    JOIN tot ON pair.l_partkey = tot.l_partkey
    JOIN part p ON p.p_partkey = pair.l_partkey
    WHERE p.p_name LIKE 'red%' AND pair.sq * 10 > tot.tq
)
""",
    tags=("layer_b", "composite"),
)
def b51_supplier_share_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp-free analog) — nested semi-join gated on
    a correlated share threshold: suppliers contributing >10% of a red
    part's total shipped quantity. Two aggregations reuse ONE shuffle
    (pair is partitioned by l_partkey, tot re-aggregates pair — no second
    scan, no second lineitem shuffle), the dim filter broadcasts, and the
    supplier probe is a left-semi join. Decimal sums keep the share
    comparison exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").startswith("red"))
    pair = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(_dec("l_quantity")).alias("sq"))
    tot = pair.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    qualifying = (
        pair.join(tot, "l_partkey")
        .join(F.broadcast(p.select("p_partkey")), pair.l_partkey == F.col("p_partkey"))
        .where(F.col("sq") * 10 > F.col("tq"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "b52_timeseries_gapfill",
    oracle="""
WITH hourly AS (
    SELECT user_id,
           make_timestamp((epoch_ms(ts) // 1000 // 3600) * 3600 * 1000000) AS hour,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
), grid AS (
    SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
    FROM bounds
)
SELECT g.user_id, g.hour,
       last_value(h.v_sum IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
       h.v_sum IS NOT NULL AS observed
FROM grid g
LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
""",
    tags=("layer_b", "timeseries"),
)
def b52_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + forward fill: build each user's dense
    hourly grid (sequence + explode between that user's own min/max
    hour), left-join the observed hourly sums back on, and carry the
    last observed value across gaps with last(ignorenulls) over an
    unbounded-preceding row frame. The grid explodes from a 1-row-per-
    user bounds aggregate — grid size is O(span), never a cross join —
    and grid⋈hourly is an equi-join on the same (user_id, hour) key the
    aggregation already partitioned by. Decimal hourly sums keep the
    carried values bit-exact."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    hourly = e.groupBy("user_id", hour).agg(
        F.sum(_dec("value")).cast("double").alias("v_sum")
    )
    bounds = hourly.groupBy("user_id").agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.last("v_sum", ignorenulls=True).over(w).alias("v_ffill"),
        F.col("v_sum").isNotNull().alias("observed"),
    )


@register(
    "b53_ewma",
    oracle="""
SELECT user_id, event_id, ts,
       round(
           list_sum(list_transform(l, (x, j) -> x * power(0.8, length(l) - j)))
           / ((1 - power(0.8, length(l))) / 0.2),
           4) AS ewma
FROM (
    SELECT user_id, event_id, ts,
           list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS l
    FROM events
)
""",
    tags=("layer_b", "timeseries"),
)
def b53_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.2) over a trailing
    20-row frame per user — the bounded-state form: weights below the
    frame horizon are < 0.8^20 ≈ 1%, so truncation is the scale-correct
    trade (O(frame) state per row, no full-history recursion). The
    recurrence is re-expressed as a closed-form weighted sum over the
    frame's collect_list, evaluated by JVM higher-order functions
    (zip_with + aggregate) — no Python, no UDF. Both engines fold the
    identical finite sum left-to-right; round(4) absorbs the last ulp."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    frame = e.select(
        "user_id", "event_id", "ts", F.collect_list("value").over(w).alias("l")
    )
    n = F.size("l")
    weighted = F.zip_with(
        "l",
        F.sequence(F.lit(1), n),
        lambda x, j: x * F.pow(F.lit(0.8), n.cast("double") - j.cast("double")),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda a, v: a + v)
    den = (F.lit(1.0) - F.pow(F.lit(0.8), n.cast("double"))) / F.lit(0.2)
    return frame.select(
        "user_id", "event_id", "ts", F.round(num / den, 4).alias("ewma")
    )


@register(
    "b54_scd2_intervals",
    oracle="""
WITH ordered AS (
    SELECT o_custkey, o_orderpriority AS attr, o_orderdate, o_orderkey,
           lag(o_orderpriority) OVER w AS prev_attr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
flagged AS (
    SELECT *, CASE WHEN prev_attr IS NULL OR prev_attr != attr THEN 1 ELSE 0 END AS chg
    FROM ordered
),
grp AS (
    SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS g
    FROM flagged
),
islands AS (
    SELECT o_custkey, attr, CAST(g AS INT) AS version,
           min(o_orderdate) AS valid_from
    FROM grp GROUP BY o_custkey, attr, g
)
SELECT o_custkey, version, attr, valid_from,
       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) AS valid_to,
       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version) IS NULL AS is_current
FROM islands
""",
    tags=("layer_b", "warehouse", "scd"),
)
def b54_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from a change feed — the
    warehouse op every dimension pipeline runs: treat each customer's
    order stream as updates to an attribute (o_orderpriority) and emit
    versioned validity intervals [valid_from, valid_to) by collapsing
    consecutive identical values (gaps-and-islands: lag -> change flag ->
    running sum), valid_to = next version's valid_from, NULL + is_current
    on the open interval. All three window specs share ONE hash partition
    on o_custkey, so the whole build is a single shuffle + groupBy reusing
    that partitioning — at 100 TB this is the minimal-movement plan (one
    exchange of (key, ts, attr) triples, no self-join of the feed against
    itself, which is the naive quadratic phrasing)."""
    o = load_table(spark, sf_dir, "orders")
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.select(
        "o_custkey",
        F.col("o_orderpriority").alias("attr"),
        "o_orderdate",
        "o_orderkey",
        F.when(
            F.lag("o_orderpriority").over(seq).isNull()
            | (F.lag("o_orderpriority").over(seq) != F.col("o_orderpriority")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    grp = flagged.withColumn(
        "g", F.sum("chg").over(seq.rowsBetween(Window.unboundedPreceding, 0))
    )
    islands = grp.groupBy("o_custkey", "attr", F.col("g").cast("int").alias("version")).agg(
        F.min("o_orderdate").alias("valid_from")
    )
    nxt = Window.partitionBy("o_custkey").orderBy("version")
    return islands.select(
        "o_custkey",
        "version",
        "attr",
        "valid_from",
        F.lead("valid_from").over(nxt).alias("valid_to"),
        F.lead("valid_from").over(nxt).isNull().alias("is_current"),
    )


@register(
    "b55_funnel_steps",
    oracle="""
WITH s1 AS (
    SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t_view
    FROM events GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t_view
          AND e.ts <= s1.t_view + INTERVAL 48 HOUR
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
          AND e.ts <= s2.t_click + INTERVAL 48 HOUR
    GROUP BY e.user_id
)
SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
       s3.t_purchase IS NOT NULL AS converted
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
WHERE s1.t_view IS NOT NULL
""",
    tags=("layer_b", "funnel", "sequence"),
)
def b55_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel attribution (the CEP/sequence-match analytic a
    clickstream warehouse runs): first 'view' per user, first 'click'
    within 48 h AFTER it, first 'purchase' within 48 h after THAT —
    strictly ordered steps, not mere co-occurrence. Three aggregates on
    the SAME user key: each step's table is per-user (<= one row each),
    so the step joins are user-key equi-joins of shrinking aggregates —
    co-located with the main shuffle, never a theta join; the 48 h bound
    is a filter under the min, not a range join. At 100 TB each step
    prunes (funnel narrows), so the chain's cost is dominated by the
    one events shuffle."""
    # the IN-filter pushes to the parquet scan (row-group pruning on the
    # fact table) — every step only reads funnel-relevant rows; never
    # materialize events itself, re-scanning the pruned columnar fact is
    # the cheap path at 100 TB
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .where(F.col("event_type").isin("view", "click", "purchase"))
    )
    # each step table is a PER-USER aggregate (<= 1 row per user):
    # checkpointing s1/s2 keeps the next step from re-deriving the whole
    # prior chain (the lazy form re-scanned events 1+2+3 = 6 times;
    # materialized step tables are user-count-sized, never the fact)
    s1 = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    ).where(F.col("t_view").isNotNull()).localCheckpoint(eager=True)
    s2 = (
        e.join(s1, "user_id")
        .where(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 48 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=True)
    )
    s3 = (
        e.join(s2, "user_id")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 48 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_purchase").isNotNull().alias("converted"),
        )
    )


@register(
    "b56_retention_cohorts",
    oracle="""
WITH first_seen AS (
    SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, fs.cohort_week, date_trunc('week', e.ts) AS active_week
    FROM events e JOIN first_seen fs ON e.user_id = fs.user_id
)
SELECT cohort_week, active_week, CAST(count(*) AS BIGINT) AS n_active_users
FROM activity
GROUP BY cohort_week, active_week
""",
    tags=("layer_b", "cohort", "retention"),
)
def b56_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix (the growth-analytics staple): users
    bucket into their first-seen week, activity dedupes to (user, week),
    and the matrix counts active users per (cohort, week). Two
    aggregates on user_id share one shuffle; the cohort join is a
    per-user aggregate (broadcastable until users outgrow it, then a
    co-located user-key join); the final matrix groupBy moves only
    (week, week, 1) triples with map-side combine."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select("user_id", "cohort_week", F.date_trunc("week", "ts").alias("active_week"))
        .distinct()
    )
    return activity.groupBy("cohort_week", "active_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_users")
    )


@register(
    "b57_market_share",
    oracle="""
WITH rev AS (
    SELECT year(o.o_orderdate) AS o_year,
           CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
           sn.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN region r ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
       CAST(sum(volume) AS DOUBLE) AS total_volume
FROM rev
GROUP BY o_year
""",
    tags=("layer_b", "composite"),
)
def b57_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): revenue volume of one
    supplier nation as a share of a region's total, per order year.
    All five dimensions broadcast (region/nation/customer/supplier are
    dim-sized); the only shuffle edges are lineitem⋈orders and the
    final year groupBy — the canonical snowflake-share plan. Share =
    conditional decimal sum / total decimal sum, rounded AFTER the
    division on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    cn = n.alias("cn")
    sn = n.alias("sn")
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(r), F.col("cn.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .where(F.col("r_name") == "ASIA")
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return rev.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share"),
        F.sum("volume").cast("double").alias("total_volume"),
    )


@register(
    "b58_idle_high_balance_customers",
    oracle="""
WITH avg_bal AS (
    SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT substr(c.c_name, 1, 9) AS name_prefix,
       c.c_custkey,
       round(c.c_acctbal, 2) AS acctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
""",
    tags=("layer_b", "composite"),
)
def b58_idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (idle high-value customers): customers whose
    balance exceeds the positive-balance average and who placed no order
    since 2000-01-01 (churn candidates). The scalar average is a one-row
    aggregate broadcast into the filter (no correlated re-evaluation);
    the existence check is a LEFT ANTI join on the customer key with the
    date filter PUSHED BELOW the distinct — at scale the anti edge moves
    recent custkeys, not orders."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            F.substring("c_name", 1, 9).alias("name_prefix"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


@register(
    "b59_small_quantity_revenue",
    oracle="""
WITH brand_li AS (
    SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#23'
),
th AS (
    SELECT l_partkey, 0.2 * avg(l_quantity) AS t
    FROM brand_li GROUP BY l_partkey
)
SELECT CAST(round(CAST(sum(CAST(b.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
            AS DOUBLE) AS avg_yearly
FROM brand_li b JOIN th ON b.l_partkey = th.l_partkey
WHERE b.l_quantity < th.t
""",
    tags=("layer_b", "composite"),
)
def b59_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): for one brand's
    parts, revenue from line items whose quantity is below 20% of that
    part's average quantity, scaled to a yearly figure. The correlated
    scalar subquery decorrelates into ONE grouped aggregate over the
    brand-pruned lineitems joined back on partkey.

    Scale posture: the brand filter broadcasts (|parts|/|brands| rows)
    and prunes lineitem at the scan edge BEFORE any shuffle; the
    per-part average becomes a WINDOW over the pruned stream, so
    lineitem is scanned ONCE and shuffled once on l_partkey (the
    aggregate-then-join-back formulation reads the fact table twice —
    at 100 TB the second scan costs more than the 4%-of-rows shuffle).
    Per-part partitions are bounded (~30 line items), so the window has
    no skew exposure. Quantities are integer-valued doubles, so
    sum/avg are exact and the 0.2*avg threshold compare is
    engine-identical; revenue sums as DECIMAL(18,2) for
    order-insensitive parity."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    t = 0.2 * F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        brand_li.withColumn("t", t)
        .where(F.col("l_quantity") < F.col("t"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "b60_disjunctive_predicate_revenue",
    oracle="""
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("layer_b", "composite", "pushdown"),
)
def b60_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive multi-attribute predicate): revenue
    over three OR'd brand/size/quantity conjunctions spanning BOTH join
    sides — the classic test of predicate decomposition.

    Scale posture: Catalyst extracts the common implications of the
    disjunction per side — the part side's (brand IN (...) AND size
    BETWEEN 1 AND 15) and the lineitem side's (quantity BETWEEN 1 AND
    30) push to their scans as PushedFilters BEFORE the join, so the
    join probes only candidate rows; the residual OR evaluates after
    the (broadcast) part join. Revenue sums as DECIMAL(18,2) products
    for order-insensitive parity (the b01 discipline)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return j.where(c1 | c2 | c3).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@register(
    "b61_nation_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND n1.n_name <> n2.n_name
  AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
    tags=("layer_b", "composite"),
)
def b61_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (bilateral trade volume): revenue shipped between
    two nations in either direction, by supplier nation, customer
    nation and year. Exercises the double-aliased-dimension topology —
    the SAME nation table joins twice under different roles.

    Scale posture: both nation dims and supplier/customer broadcast;
    the only shuffle edges are lineitem->orders (keyed). The
    either-direction predicate evaluates after the broadcasts, but each
    nation dim is pre-filtered to the two named nations BEFORE its
    broadcast, so the fact stream is cut by the supplier semi-product
    early. Date range prunes the lineitem scan (PushedFilters).
    Revenue sums as DECIMAL(18,2) products (b01 discipline)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    nations = ("NATION_1", "NATION_2", "NATION_3")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "b62_product_type_profit",
    oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))
              - CAST(p.p_retailprice AS DECIMAL(18,2))
                * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
""",
    tags=("layer_b", "composite"),
)
def b62_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit by nation and year): revenue
    minus cost (retail price x quantity stands in for ps_supplycost —
    the schema has no partsupp) for parts whose name matches a product
    line, rolled up by supplier nation and order year.

    Scale posture: the part filter (LIKE on a broadcast dim) cuts the
    fact stream FIRST — the most selective edge runs earliest; supplier
    and nation broadcast; the single shuffle join is lineitem->orders
    on orderkey. All money terms are DECIMAL(18,2) products, so the
    profit sum is order-exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    amount = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(18,2)"
    ) - _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


@register(
    "b64_priority_late_orders",
    oracle="""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
""",
    tags=("layer_b", "composite"),
)
def b64_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders placed in a
    six-month window that had at least one line item shipped more than
    60 days after ordering, counted by priority — the classic
    correlated-EXISTS composite.

    Scale posture: the EXISTS decorrelates into a LEFT SEMI join on
    orderkey with the lateness predicate evaluated in the join
    condition (it references both sides, so it rides the join, not a
    scan filter); the date-range predicate DOES push to the orders
    scan and prunes before the shuffle. Output is |priorities|-sized
    with map-side combine."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@register(
    "b65_returned_item_revenue",
    oracle="""
SELECT c.c_custkey, substr(c.c_name, 1, 12) AS name_prefix,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, substr(c.c_name, 1, 12), n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("layer_b", "composite"),
)
def b65_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in one quarter, with nation context.

    Scale posture: both date-range and returnflag predicates push to
    their scans; customer and nation broadcast; the one shuffle edge is
    lineitem->orders on orderkey. Revenue is DECIMAL(18,2)-exact, and
    the rounded-revenue-first ordering with the custkey tiebreak makes
    the top-20 deterministic; orderBy+limit plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            F.substring("c_name", 1, 12).alias("name_prefix"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "b66_large_volume_customers",
    oracle="""
WITH big AS (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 250
)
SELECT substr(c.c_name, 1, 12) AS name_prefix, c.c_custkey,
       o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice, 2) AS DOUBLE) AS o_totalprice,
       CAST(b.total_qty AS DOUBLE) AS total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
    tags=("layer_b", "composite"),
)
def b66_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    line-item quantity exceeds 250 units, with customer context — the
    grouped-HAVING-then-join-back composite.

    Scale posture: the quantity rollup aggregates lineitem FIRST (one
    orderkey shuffle with map-side combine), and only the surviving
    ~0.1% of orderkeys join back — the join probes shrink before any
    dimension touches them; customer broadcasts. Quantities are
    integer-valued doubles, so the HAVING threshold is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.substring("c_name", 1, 12).alias("name_prefix"),
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double"),
        )
    )


@register(
    "b67_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    tags=("layer_b", "composite"),
)
def b67_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue where the
    customer and the line's supplier share a nation, by nation within
    one region and year — the same-dimension-equality join topology
    (the supplier edge carries BOTH the key equi-condition and the
    customer-nation equality).

    Scale posture: region->nation prunes the nation dim before
    broadcast; the date range pushes to the orders scan; customer and
    supplier broadcast; the only shuffle edge is lineitem->orders.
    Revenue is DECIMAL(18,2)-exact."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "b68_promo_revenue_share",
    oracle="""
SELECT CAST(round(
         100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                               * CAST(1 - l.l_discount AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE), 4)
       AS DOUBLE) AS promo_share_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
    tags=("layer_b", "composite"),
)
def b68_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the promo share of one
    month's revenue — two conditional aggregates in ONE pass, their
    ratio scaled to percent. Both sums are DECIMAL(18,2)-exact; the
    single division happens on the two exact totals (rounded at 4).

    Scale posture: the ship-month predicate pushes to the lineitem
    scan; part broadcasts; one aggregate, no shuffle beyond the
    broadcast probe — the canonical conditional-aggregate-ratio plan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 4
            )
            .cast("double")
            .alias("promo_share_pct")
        )
    )


@register(
    "b69_forecast_revenue_change",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("layer_b", "aggregate", "pushdown"),
)
def b69_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the revenue that
    would have been kept by eliminating small discounts on small
    quantities — THE scan-pushdown benchmark: every predicate (date
    range, discount band, quantity cap) reaches the parquet scan as a
    PushedFilter, the projection reads 4 columns, and the whole query
    is one map-side-combinable aggregate with zero joins.

    Discount values are 2-decimal, so the band bounds 0.05/0.07 compare
    exactly; the product sums as DECIMAL for order-insensitivity."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "b70_fulfillment_latency",
    oracle="""
SELECT o.o_orderpriority,
       CAST(datediff('day', o.o_orderdate, l.l_shipdate) // 7 AS INT) AS weeks_band,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority, datediff('day', o.o_orderdate, l.l_shipdate) // 7
""",
    tags=("layer_b", "aggregate", "operational"),
)
def b70_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency histogram — the operations dashboard
    ('how long from order to ship, by priority?'): integer day
    difference bucketed into weeks, counted per priority band. All
    integer arithmetic; output is |priorities| x |weeks|-sized.

    Scale posture: one keyed join (lineitem->orders) and one
    map-side-combinable aggregate on a small composite key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderpriority",
            F.expr("datediff(l_shipdate, o_orderdate) div 7").cast("int").alias("weeks_band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_items"))
    )


@register(
    "b71_abc_analysis",
    oracle="""
WITH rev AS (
    SELECT l_partkey,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS rev_dec
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS revenue,
           sum(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_dec,
           sum(rev_dec) OVER () AS total_dec
    FROM rev
)
SELECT l_partkey, revenue,
       round(CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE), 6) AS cum_share,
       CASE WHEN round(CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE), 6) <= 0.8 THEN 'A'
            WHEN round(CAST(cum_dec AS DOUBLE) / CAST(total_dec AS DOUBLE), 6) <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
""",
    tags=("layer_b", "window", "pareto"),
)
def b71_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis — the inventory-management classic: parts
    ranked by revenue, classified A (top 80% of cumulative revenue),
    B (next 15%), C (tail). Classification compares the ROUNDED share
    (round-before-compare, the x73 flag discipline). Revenue is
    emitted UNrounded: the decimal-sum-cast-double is bit-identical,
    but round(x, 2) over a 4-decimal double diverges between engines
    on .xx5 boundaries (display rounding belongs to presentation).

    Scale posture — DISTRIBUTED prefix sum (the x85 carry pattern):
    at TPC-H-at-100TB `part` is ~20B rows, so a single global
    cumulative window over parts is a real chokepoint. Instead,
    repartitionByRange on the rank order (sampled range boundaries —
    Spark's native distributed sort partitioner) splits parts into
    order-respecting buckets; the cumulative sum runs WITHIN each
    bucket in parallel, and each bucket adds a carry = sum of all
    earlier buckets' totals (one |buckets|-sized window). Float
    caveat: two-level summation changes accumulation grouping, so the
    running sum stays in EXACT DECIMAL (associative — grouping-
    independent), matching the oracle's exact HUGEINT-backed decimal
    window; doubles appear only in the single final division."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                _dec("l_extendedprice")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
            ).alias("rev_dec")
        )
    )
    # Range-partition in rank order, then freeze bucket ids (checkpoint:
    # three references probe the bucketed frame; spark_partition_id is
    # only meaningful on the materialized partitioning).
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bucketed = (
        rev.repartitionByRange(n_buckets, F.desc("rev_dec"), F.asc("l_partkey"))
        .withColumn("bucket", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("rev_dec"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn("run", F.sum("rev_dec").over(w_in))
    btot = bucketed.groupBy("bucket").agg(F.sum("rev_dec").alias("btot"))
    carry = btot.withColumn(
        "carry",
        F.coalesce(
            F.sum("btot").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("decimal(38,4)"),
        ),
    ).select("bucket", "carry")
    total = btot.agg(F.sum("btot").alias("total_dec"))
    share = F.round(
        (F.col("run") + F.col("carry")).cast("double") / F.col("total_dec").cast("double"),
        6,
    )
    return (
        within.join(F.broadcast(carry), "bucket")
        .crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            share.alias("cum_share"),
            F.when(share <= 0.8, "A")
            .when(share <= 0.95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )


@register(
    "b72_custdist",
    oracle="""
WITH percust AS (
    SELECT c.c_custkey,
           count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM percust GROUP BY c_count
""",
    tags=("layer_b", "join", "tpch_q13"),
)
def b72_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — the
    LEFT OUTER JOIN with a join-riding predicate (non-urgent orders
    stand in for Q13's `o_comment NOT LIKE`, which this fixture's
    schema omits) followed by a two-level aggregation, keeping
    zero-order customers in the c_count = 0 bucket (the part an inner
    join silently loses).

    Scale posture: the right side is pre-filtered before the join
    (equivalent to the riding predicate under LEFT semantics, and it
    pushes to the orders scan); first aggregate is keyed on c_custkey
    (map-side combinable), second on the tiny c_count domain — one
    broadcast-able dim join + two shrinking exchanges."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    percust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return percust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )
