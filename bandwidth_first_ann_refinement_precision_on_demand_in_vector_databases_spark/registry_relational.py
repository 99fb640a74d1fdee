"""Relational operator suite (SURVEY §2.3 J4, §2.4 A6, §2.5 W8, §2.7,
§2.8) — declared Spark/DuckDB pairs over the TPC-H-ish fixtures.

Determinism rules specific to this suite:

* **Money sums are DECIMAL.** Grouped SUM over DOUBLE has unspecified
  accumulation order in both engines; sums over exact DECIMAL are
  order-independent, so every aggregated price/discount expression is
  cast to DECIMAL before summing and back to DOUBLE after. Averages
  are written ``CAST(sum AS DOUBLE) / count``, never ``avg``.
* **Every window order has a unique tie-break** (event_id, orderkey).
* Day-of-week uses ISO numbering on both sides (Spark's
  ``dayofweek`` is Sunday=1, so it is remapped).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.relational import asof_join, range_join_count, salted_agg_sum_count
from .sources.fixtures import load_table


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Aggregations (A6)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash aggregate with partial (map-side) combine
    over lineitem; all money math exact DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("__sq"),
            F.sum(_dec("l_extendedprice")).alias("__sbp"),
            F.sum(disc_price).alias("__sdp"),
            F.sum(charge).alias("__sc"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("__sq").cast("double").alias("sum_qty"),
            F.col("__sbp").cast("double").alias("sum_base_price"),
            F.col("__sdp").cast("double").alias("sum_disc_price"),
            F.col("__sc").cast("double").alias("sum_charge"),
            (F.col("__sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            "count_order",
        )
    )
    return out


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
  count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets with exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).alias("__sq"), F.count("*").alias("n_rows"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("__sq").cast("double").alias("sum_qty"),
            "n_rows",
        )
    )


SQL_ROLLUP_LINEITEM = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over order status/priority."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.sum(_dec("o_totalprice")).alias("__s"))
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_orders",
            F.col("__s").cast("double").alias("sum_price"),
        )
    )


SQL_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation per group."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


SQL_COUNT_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct (engine-specific estimate → rows-only check;
    declared to prove the approximate-aggregation surface)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


# ---------------------------------------------------------------------------
# Joins (J4)
# ---------------------------------------------------------------------------

def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join; the three dimension tables are
    explicitly broadcast — only lineitem⋈orders shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).alias("__rev"), F.count("*").alias("n_items"))
        .select("r_name", "n_name", F.col("__rev").cast("double").alias("revenue"), "n_items")
    )


SQL_REGION_REVENUE = """
SELECT r_name, n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective join chain + top-N by exact revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(
        load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).alias("__rev"))
        .select("o_orderkey", "o_orderdate", F.col("__rev").cast("double").alias("revenue"))
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_orderdate,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers that have at least one 'F' order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_nationkey"
    )


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_acctbal FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J4): each order picks up the most recent event (at
    or before its date) of its mapped user. Right side deduped to one
    row per (user, ts) so the match is unique on both engines."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_custkey") % 20).alias("uid"),
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("ev_value"))
        .withColumnRenamed("user_id", "uid")
    )
    out = asof_join(
        o, e, key="uid", left_ts="o_orderdate", right_ts="ts", value_cols=["ev_value"]
    )
    return out.select("o_orderkey", "uid", F.round("ev_value", 6).alias("ev_value"))


SQL_ASOF_JOIN = """
WITH e AS (
  SELECT user_id, ts, max(value) AS ev_value FROM events GROUP BY user_id, ts
),
o AS (
  SELECT o_orderkey, o_orderdate, o_custkey % 20 AS uid FROM orders
)
SELECT o.o_orderkey, o.uid, round(e.ev_value, 6) AS ev_value
FROM o ASOF LEFT JOIN e ON o.uid = e.user_id AND e.ts <= o.o_orderdate
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval θ-join: events followed by others of the same user
    within 1 hour (bucketized equi-join realization)."""
    e = load_table(spark, sf_dir, "events")
    out = range_join_count(
        e, e, key="user_id", left_ts="ts", right_ts="ts", max_gap_seconds=3600
    )
    return out.select("event_id", "user_id", "n_followers")


SQL_RANGE_JOIN = """
SELECT a.event_id, a.user_id,
  (SELECT count(*) FROM events b
    WHERE b.user_id = a.user_id
      AND CAST(floor(epoch(b.ts)) AS BIGINT) >  CAST(floor(epoch(a.ts)) AS BIGINT)
      AND CAST(floor(epoch(b.ts)) AS BIGINT) <= CAST(floor(epoch(a.ts)) AS BIGINT) + 3600
  ) AS n_followers
FROM events a
"""


# ---------------------------------------------------------------------------
# Windows (W8)
# ---------------------------------------------------------------------------

def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum / lag / lead / row_number ordered by time."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("seq"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("double"),
            6,
        ).alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


SQL_WINDOW_RUNNING = """
SELECT event_id, user_id,
  CAST(row_number() OVER w AS INT) AS seq,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS running_value,
  lag(event_type, 1) OVER w AS prev_type,
  lead(event_type, 1) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile frames per event type."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


SQL_WINDOW_RANK = """
SELECT event_id, event_type,
  CAST(rank() OVER w AS INT) AS rnk,
  CAST(dense_rank() OVER w AS INT) AS drnk,
  CAST(ntile(4) OVER w AS INT) AS quartile
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
"""


# ---------------------------------------------------------------------------
# Set operations (§2.8)
# ---------------------------------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over per-type user-id sets."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    sig = ev.where(F.col("event_type") == "signup").select("user_id").distinct()
    both = err.intersect(sig).withColumn("set_kind", F.lit("both"))
    only_err = err.exceptAll(sig).withColumn("set_kind", F.lit("error_only"))
    union_all = err.union(sig).distinct().withColumn("set_kind", F.lit("any"))
    return both.unionByName(only_err).unionByName(union_all)


SQL_SET_OPS = """
WITH err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
sig AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
SELECT user_id, 'both' AS set_kind FROM (SELECT user_id FROM err INTERSECT SELECT user_id FROM sig)
UNION ALL
SELECT user_id, 'error_only' FROM (SELECT user_id FROM err EXCEPT SELECT user_id FROM sig)
UNION ALL
SELECT user_id, 'any' FROM (SELECT user_id FROM err UNION SELECT user_id FROM sig)
"""


# ---------------------------------------------------------------------------
# Scalar functions (§2.7): string / date / JSON
# ---------------------------------------------------------------------------

def q_scalar_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "documents")
    return ev.select(
        "doc_id",
        F.length("text").alias("n_len"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.col("lang"),
        F.col("text").like("%spark%").alias("mentions_spark"),
    )


SQL_SCALAR_TEXT = """
SELECT doc_id,
  CAST(length(text) AS INT) AS n_len,
  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT) AS n_tokens,
  upper(substr(text, 1, 10)) AS head10,
  lang,
  (text LIKE '%spark%') AS mentions_spark
FROM documents
"""


def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek("ts") + 5) % 7) + 1  # → ISO Mon=1..Sun=7
    return (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.hour("ts").alias("hour"),
            iso_dow.alias("iso_dow"),
        )
        .agg(F.count("*").alias("n"))
    )


SQL_SCALAR_DATETIME = """
SELECT date_trunc('day', ts) AS day,
  CAST(extract(hour FROM ts) AS INT) AS hour,
  CAST(isodow(ts) AS INT) AS iso_dow,
  count(*) AS n
FROM events GROUP BY 1, 2, 3
"""


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    ).where(F.col("k_val") > 50)


SQL_SCALAR_JSON = """
SELECT event_id, CAST(props->>'$.k' AS INT) AS k_val
FROM events WHERE CAST(props->>'$.k' AS INT) > 50
"""


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation; the oracle is the plain GROUP BY,
    asserting the skew-resistant plan changes nothing but the shuffle."""
    return salted_agg_sum_count(load_table(spark, sf_dir, "events"), "event_type", "value")


SQL_SALTED_AGG = """
SELECT event_type,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  count(*) AS n_rows
FROM events GROUP BY event_type
"""


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (sort-based
    aggregate; both engines use the linear-interpolation definition)."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.9D))")
    return (
        ev.groupBy("event_type")
        .agg(pct.alias("__p"))
        .select(
            "event_type",
            *[
                F.round(F.element_at("__p", i + 1), 6).alias(name)
                for i, name in enumerate(["p25", "p50", "p75", "p90"])
            ],
        )
    )


SQL_VALUE_QUANTILES = """
SELECT event_type,
  round(quantile_cont(value, 0.25), 6) AS p25,
  round(quantile_cont(value, 0.5), 6) AS p50,
  round(quantile_cont(value, 0.75), 6) AS p75,
  round(quantile_cont(value, 0.9), 6) AS p90
FROM events GROUP BY event_type
"""


def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-hierarchical GROUPING SETS — ((status), (priority)) is
    expressible as neither ROLLUP nor CUBE, completing the A6 grouping
    family. Planned as a single-scan Expand (each input row fans out
    once per set), not a union of re-scans."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               count(*) AS n_orders
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


SQL_GROUPING_SETS_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-count-based): per-user
    sum of event values over the trailing 10 minutes of *event time* —
    the W8 frame variant ``window_running``'s ROWS frame cannot
    express. Event time is converted to epoch seconds via timezone-free
    field extraction (identical arithmetic on both engines — no
    session-timezone dependence, unlike ``unix_timestamp``)."""
    ev = load_table(spark, sf_dir, "events")
    epoch_s = (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast("bigint")
        * 86400
        + F.hour("ts") * 3600
        + F.minute("ts") * 60
        + F.second("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__es")
        .rangeBetween(-600, Window.currentRow)
    )
    return (
        ev.select("event_id", "user_id", "value", epoch_s.alias("__es"))
        .select(
            "event_id",
            "user_id",
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 6
            ).alias("trailing_10m_value"),
        )
    )


SQL_WINDOW_RANGE_FRAME = """
WITH e AS (
  SELECT event_id, user_id, value,
    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) * 86400
      + hour(ts) * 3600 + minute(ts) * 60 + CAST(floor(second(ts)) AS BIGINT) AS es
  FROM events
)
SELECT event_id, user_id,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY es
    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS trailing_10m_value
FROM e
"""


#: event types are a closed fixture set — the pivot's column universe
#: is declared, not inferred, so the plan is one scan + one aggregate
#: (no extra distinct-values pass) and the SQL twin lists the same
#: columns.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts spread into one column per event
    type, plus an exact DECIMAL value total. Conditional aggregation —
    one scan, map-side combine, one shuffle row per user."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


SQL_PIVOT_EVENTS = f"""
SELECT user_id,
  {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}" for t in EVENT_TYPES)},
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id
"""



def q_global_rank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL rank of every event by (value DESC, event_id) —
    the classic OLAP "rank the whole table" ask, planned WITHOUT the
    single-partition window `row_number() OVER (ORDER BY ...)` compiles
    to: `operators/relational.parallel_global_rank` decomposes into
    percentile-split range buckets ranked in parallel and stitched by a
    broadcast offset frame (exactness argument in the operator
    docstring; property-tested against the window form over ties and
    degenerate bucket counts). The DuckDB twin IS the plain window —
    the oracle check proves the decomposition exact on real data."""
    from .operators.relational import parallel_global_rank

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    return parallel_global_rank(ev, "value", "event_id", "grnk").select(
        "grnk",
        "event_id",
        (F.round("value", 6) + F.lit(0.0)).alias("value"),
    )


SQL_GLOBAL_RANK_EVENTS = """
SELECT CAST(row_number() OVER (ORDER BY value DESC NULLS LAST, event_id) AS INT)
         AS grnk,
       event_id, round(value, 6) + 0.0 AS value
FROM events
"""


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "rollup_lineitem": q_rollup_lineitem,
    "cube_orders": q_cube_orders,
    "count_distinct": q_count_distinct,
    "approx_count_distinct": q_approx_count_distinct,
    "region_revenue": q_region_revenue,
    "top_orders": q_top_orders,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "window_running": q_window_running,
    "window_rank": q_window_rank,
    "set_ops": q_set_ops,
    "scalar_text": q_scalar_text,
    "scalar_datetime": q_scalar_datetime,
    "scalar_json": q_scalar_json,
    "salted_agg": q_salted_agg,
    "value_quantiles": q_value_quantiles,
    "grouping_sets_orders": q_grouping_sets_orders,
    "window_range_frame": q_window_range_frame,
    "pivot_events": q_pivot_events,
    "global_rank_events": q_global_rank_events,
}

RELATIONAL_ORACLES: dict[str, str] = {
    "pricing_summary": SQL_PRICING_SUMMARY,
    "rollup_lineitem": SQL_ROLLUP_LINEITEM,
    "cube_orders": SQL_CUBE_ORDERS,
    "count_distinct": SQL_COUNT_DISTINCT,
    # approx_count_distinct: engine-specific sketch → rows-only
    "region_revenue": SQL_REGION_REVENUE,
    "top_orders": SQL_TOP_ORDERS,
    "semi_join": SQL_SEMI_JOIN,
    "anti_join": SQL_ANTI_JOIN,
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "window_running": SQL_WINDOW_RUNNING,
    "window_rank": SQL_WINDOW_RANK,
    "set_ops": SQL_SET_OPS,
    "scalar_text": SQL_SCALAR_TEXT,
    "scalar_datetime": SQL_SCALAR_DATETIME,
    "scalar_json": SQL_SCALAR_JSON,
    "salted_agg": SQL_SALTED_AGG,
    "value_quantiles": SQL_VALUE_QUANTILES,
    "grouping_sets_orders": SQL_GROUPING_SETS_ORDERS,
    "window_range_frame": SQL_WINDOW_RANGE_FRAME,
    "pivot_events": SQL_PIVOT_EVENTS,
    "global_rank_events": SQL_GLOBAL_RANK_EVENTS,
}


# ---------------------------------------------------------------------------
# Batch sessionization (gap-based) — the classic clickstream shape
# ---------------------------------------------------------------------------

#: inactivity gap that closes a session (the streaming twin
#: ``stream_session_windows`` uses the engine's session window with
#: its own gap; this is the BATCH replay shape over the same events)
SESSION_GAP_S = 1800


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: per-user event streams split where
    the inter-event gap exceeds ``SESSION_GAP_S``, then one row per
    session with start/end/count/value. The two-window idiom (lag →
    new-session flag → running sum) keys every window on ``user_id``
    — fully partition-parallel, no global sort, the batch complement
    of the Structured Streaming session-window query.

    Timestamps are compared in epoch seconds (``unix_timestamp``;
    session TZ pinned UTC by the harness ↔ DuckDB ``floor(epoch())``
    — the proven interval-join idiom)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp(F.col("ts")).alias("tsec"),
    )
    w = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    gap = F.col("tsec") - F.lag("tsec", 1).over(w)
    flagged = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("tsec").alias("start_sec"),
            F.max("tsec").alias("end_sec"),
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .select(
            "user_id",
            "session_id",
            "start_sec",
            "end_sec",
            (F.col("end_sec") - F.col("start_sec")).alias("duration_sec"),
            "n_events",
            "sum_value",
        )
    )


SQL_SESSIONIZE = f"""
WITH ev AS (
  SELECT event_id, user_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS tsec
  FROM events
),
flagged AS (
  SELECT *,
    CASE WHEN lag(tsec) OVER w IS NULL
              OR tsec - lag(tsec) OVER w > {SESSION_GAP_S}
         THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
),
sess AS (
  SELECT *,
    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tsec, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
  min(tsec) AS start_sec,
  max(tsec) AS end_sec,
  max(tsec) - min(tsec) AS duration_sec,
  count(*) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_value
FROM sess GROUP BY user_id, session_id
"""

RELATIONAL_QUERIES["sessionize"] = q_sessionize
RELATIONAL_ORACLES["sessionize"] = SQL_SESSIONIZE


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customer ⋈
    orders ⋈ lineitem with date predicates on BOTH fact scans, revenue
    per (order, date, priority), top 10. The segment/date filters push
    into the parquet scans (PushedFilters); customer broadcasts; only
    lineitem⋈orders shuffles — Q3's classic plan."""
    cutoff = "1998-06-30"
    c = F.broadcast(
        load_table(spark, sf_dir, "customer").where(
            F.col("c_mktsegment") == "BUILDING"
        )
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp_ntz")
    )
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    out = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("__rev"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
            F.col("__rev").cast("double").alias("revenue"),
        )
    )
    return out.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
  o_orderpriority,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate  > TIMESTAMP '1998-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): orders in a quarter
    that have ≥1 late lineitem (l_shipdate < o_orderdate is this
    fixture's 'commit violated' stand-in), counted per priority. The
    EXISTS becomes a LEFT SEMI join — no row multiplication however
    many lineitems match, the scale-correct decorrelation."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).where(F.col("l_shipdate") < F.col("o_orderdate")).select("l_orderkey")
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


SQL_ORDER_PRIORITY_COUNT = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate < o.o_orderdate
  )
GROUP BY o_orderpriority
"""

RELATIONAL_QUERIES["shipping_priority"] = q_shipping_priority
RELATIONAL_ORACLES["shipping_priority"] = SQL_SHIPPING_PRIORITY
RELATIONAL_QUERIES["order_priority_count"] = q_order_priority_count
RELATIONAL_ORACLES["order_priority_count"] = SQL_ORDER_PRIORITY_COUNT


def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): revenue lost to
    returns per customer over one quarter — returnflag filter on the
    lineitem scan, date filter on the orders scan (both pushed),
    customer + nation broadcast, top 20 by lost revenue
    (TakeOrdered)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    out = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).alias("__rev"), F.count("*").alias("n_items"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("__rev").cast("double").alias("revenue"),
            "n_items",
        )
    )
    return out.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


SQL_RETURNED_ITEM_REVENUE = """
SELECT c_custkey, c_name, n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

RELATIONAL_QUERIES["returned_item_revenue"] = q_returned_item_revenue
RELATIONAL_ORACLES["returned_item_revenue"] = SQL_RETURNED_ITEM_REVENUE


# ---------------------------------------------------------------------------
# r08 TPC-H shape breadth: Q5 proper (local supplier volume), Q12
# (priority line counts per class), Q19 (disjunctive-predicate revenue)
# ---------------------------------------------------------------------------

def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 proper (local supplier volume): the 6-way join — the
    r01 ``region_revenue`` 5-way plus supplier, with the LOCAL
    condition c_nationkey = s_nationkey joining the two dimension
    chains. Plan shape at scale: lineitem⋈orders is the only
    fact-fact shuffle; supplier/customer/nation/region broadcast; the
    region filter prunes the nation broadcast before it reaches the
    fact side; the date range pushes into the orders scan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("__rev"), F.count("*").alias("n_items"))
        .select(
            "n_name", F.col("__rev").cast("double").alias("revenue"), "n_items"
        )
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): per line
    class (l_returnflag stands in for l_shipmode — the fixture has no
    mode column), count lines of high- vs low-priority orders among
    lines shipped in 1997 on/after their order date. One fact-fact
    equi-join on the order key + a conditional aggregate — the
    CASE-inside-SUM pivot Q12 is known for; the ship-date range pushes
    into the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_PRIORITY_LINE_COUNTS = """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_shipdate >= o_orderdate
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_brand_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    lineitem ⋈ part with an OR of three (brand, size-range,
    quantity-range) conjunctions — the classic predicate no scan can
    fully push. Part broadcasts (dimension-sized); the OR evaluates
    post-join in codegen; one global aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 35)
            & q.between(20, 30)
        )
    )
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


SQL_BRAND_DISCOUNT_REVENUE = """
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""

RELATIONAL_QUERIES["local_supplier_volume"] = q_local_supplier_volume
RELATIONAL_ORACLES["local_supplier_volume"] = SQL_LOCAL_SUPPLIER_VOLUME
RELATIONAL_QUERIES["priority_line_counts"] = q_priority_line_counts
RELATIONAL_ORACLES["priority_line_counts"] = SQL_PRIORITY_LINE_COUNTS
RELATIONAL_QUERIES["brand_discount_revenue"] = q_brand_discount_revenue
RELATIONAL_ORACLES["brand_discount_revenue"] = SQL_BRAND_DISCOUNT_REVENUE


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lines of one
    brand whose quantity is below 20% of their part's average — the
    classic CORRELATED scalar subquery, decorrelated into a per-part
    aggregate joined back (never re-executed per row). Plan: one
    map-side-combined avg over lineitem grouped by part (part-table
    sized → broadcast), brand filter pushed into the part scan.

    Cross-engine note: avg(l_quantity) is sum/count of INTEGRAL floats
    — the double sum is order-independent (exact integers ≤ 2^53), so
    the 0.2·avg threshold is deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg(F.col("l_quantity").cast("double")).alias("avg_qty")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(F.broadcast(part_avg), li.l_partkey == F.col("pk"))
        .where(
            F.col("l_quantity").cast("double")
            < F.lit(0.2) * F.col("avg_qty")
        )
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


SQL_SMALL_QUANTITY_REVENUE = """
WITH part_avg AS (
  SELECT l_partkey AS pk, avg(CAST(l_quantity AS DOUBLE)) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON pk = l_partkey
WHERE p_brand = 'Brand#23'
  AND CAST(l_quantity AS DOUBLE) < 0.2 * avg_qty
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each part, the
    supplier offering its CHEAPEST line price (ties → smaller
    suppkey), with the supplier's name and nation attached. The
    correlated min-subquery decorrelates to a per-(part, supplier) min
    aggregate followed by a per-part struct-min argmin — both
    map-side-combining, one row per group on the shuffle; supplier and
    nation broadcast onto the argmin result (part-table sized)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    offer = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("best_price")
    )
    best = (
        offer.groupBy("l_partkey")
        .agg(F.min(F.struct("best_price", "l_suppkey")).alias("__m"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("__m.best_price").cast("double").alias("min_price"),
            F.col("__m.l_suppkey").alias("suppkey"),
        )
    )
    return (
        best.join(s, best.suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select("partkey", "min_price", "suppkey", "s_name", "n_name")
    )


SQL_MIN_COST_SUPPLIER = """
WITH offer AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS best_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey AS partkey,
         CAST(best_price AS DOUBLE) AS min_price,
         l_suppkey AS suppkey
  FROM (
    SELECT l_partkey, l_suppkey, best_price,
      row_number() OVER (PARTITION BY l_partkey
        ORDER BY best_price ASC, l_suppkey ASC) AS r
    FROM offer
  ) WHERE r = 1
)
SELECT partkey, min_price, suppkey, s_name, n_name
FROM best
JOIN supplier ON suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
"""

RELATIONAL_QUERIES["small_quantity_revenue"] = q_small_quantity_revenue
RELATIONAL_ORACLES["small_quantity_revenue"] = SQL_SMALL_QUANTITY_REVENUE
RELATIONAL_QUERIES["min_cost_supplier"] = q_min_cost_supplier
RELATIONAL_ORACLES["min_cost_supplier"] = SQL_MIN_COST_SUPPLIER


def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-customer potential): customers whose
    balance exceeds the average POSITIVE balance and who have placed
    no RECENT orders (every fixture customer has some order, so the
    recency predicate keeps the anti-join non-vacuous at every SF),
    grouped by nation. Two decorrelations in one query: the correlated
    NOT EXISTS becomes a LEFT ANTI join (the complement of Q4's semi —
    still no row multiplication, and the date filter pushes into the
    orders scan BEFORE the anti-join), and the scalar average becomes
    a broadcast 1-row frame. Money stays DECIMAL through the sum; the
    threshold divides once in double (deterministic IEEE)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count("*")
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
        .select(
            F.col("c_nationkey").alias("nationkey"), "n_customers", "total_bal"
        )
    )


SQL_IDLE_CUSTOMER_BALANCE = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS nationkey, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE CAST(c_acctbal AS DOUBLE) > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part revenue value kept
    only when it exceeds a FRACTION of the corpus-wide total — the
    HAVING-against-a-scalar-subquery pattern, decorrelated to one
    per-part aggregate plus a broadcast 1-row global total (the same
    aggregate reused at two granularities, never recomputed per
    group). DECIMAL sums exact; the fraction threshold is one double
    product."""
    li = load_table(spark, sf_dir, "lineitem")
    value = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(value).alias("__v"))
    total = per_part.agg(F.sum("__v").alias("__t"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("__v").cast("double")
            > F.lit(0.0005) * F.col("__t").cast("double")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("__v").cast("double").alias("part_value"),
        )
    )


SQL_IMPORTANT_PARTS = """
WITH per_part AS (
  SELECT l_partkey AS partkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS v
  FROM lineitem GROUP BY l_partkey
),
total AS (SELECT sum(v) AS t FROM per_part)
SELECT partkey, CAST(v AS DOUBLE) AS part_value
FROM per_part, total
WHERE CAST(v AS DOUBLE) > 0.0005 * CAST(t AS DOUBLE)
"""


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): per (brand,
    size-class) the number of DISTINCT suppliers shipping that part
    class, excluding a deterministic supplier blacklist (s_suppkey ≡ 0
    mod 7 — the fixture-derived-class idiom; nonempty at every SF,
    where a balance flag is empty at sf0.001). The NOT IN becomes a
    broadcast anti-join BEFORE the distinct count so excluded
    suppliers never inflate the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_suppkey") % 7 == 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", (F.col("p_size") % 5).alias("size_class"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_SUPPLIER_PART_COUNTS = """
SELECT p_brand, p_size % 5 AS size_class,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0)
GROUP BY p_brand, p_size % 5
"""

RELATIONAL_QUERIES["idle_customer_balance"] = q_idle_customer_balance
RELATIONAL_ORACLES["idle_customer_balance"] = SQL_IDLE_CUSTOMER_BALANCE
RELATIONAL_QUERIES["important_parts"] = q_important_parts
RELATIONAL_ORACLES["important_parts"] = SQL_IMPORTANT_PARTS
RELATIONAL_QUERIES["supplier_part_counts"] = q_supplier_part_counts
RELATIONAL_ORACLES["supplier_part_counts"] = SQL_SUPPLIER_PART_COUNTS


# ---------------------------------------------------------------------------
# r09 TPC-H join-shape tail (r08 verdict #6): Q13 / Q18 / Q21
# ---------------------------------------------------------------------------

def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): LEFT join customers to
    a FILTERED orders scan, count per customer (zero-order customers
    survive as count 0 — count(o_orderkey) skips the null-extended
    rows), then the count-of-counts distribution. Two aggregates, both
    map-side combined; the filter (priority ≠ 1-URGENT — the fixture
    stand-in for Q13's comment NOT LIKE) pushes into the orders scan
    BEFORE the join."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select("c_count", "custdist")
    )


SQL_CUSTOMER_ORDER_COUNTS = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count
"""


#: Q18 volume threshold: p99 of per-order quantity sums is ~262-270
#: across SFs (max 378/458) — 250 keeps the class non-empty at every
#: SF while staying a genuine tail filter.
Q18_QTY_THRESHOLD = 250
Q18_LIMIT = 100


def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): IN over a grouped
    aggregate (orders whose quantity sum exceeds the threshold —
    decorrelated to a semi-joinable one-column frame) feeding a
    customer/orders/lineitem join, re-aggregated per order, then
    TakeOrdered: ORDER BY o_totalprice DESC LIMIT 100 plans as
    TakeOrderedAndProject — each partition keeps its local top-100,
    never a global sort (o_orderkey breaks price/date ties
    deterministically)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("double")).alias("__q"))
        .where(F.col("__q") > Q18_QTY_THRESHOLD)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("double")).alias("total_qty"))
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(Q18_LIMIT)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("orderdate"),
            (F.round(F.col("o_totalprice"), 2) + F.lit(0.0)).alias("totalprice"),
            "total_qty",
        )
    )


SQL_LARGE_ORDER_CUSTOMERS = f"""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS orderdate,
       round(o_totalprice, 2) + 0.0 AS totalprice,
       total_qty
FROM (
  SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
         sum(CAST(l.l_quantity AS DOUBLE)) AS total_qty
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DOUBLE)) > {Q18_QTY_THRESHOLD}
  )
  GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
  ORDER BY o.o_totalprice DESC, o.o_orderdate ASC, o.o_orderkey ASC
  LIMIT {Q18_LIMIT}
)
"""


#: Q21 lateness: the fixture has no commit/receipt dates, so "kept
#: waiting" = shipped more than 60 days after the order date (~half
#: the lines — the multi-supplier only-late-one composition below is
#: what thins it to a real tail: 10 suppliers at sf0.001).
Q21_LATE_DAYS = 60
Q21_LIMIT = 50


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    chained EXISTS / NOT EXISTS self-join pair, decorrelated to one
    SEMI and one ANTI join over the late-pairs frame — a supplier
    counts for an order iff it shipped late on a finished order, SOME
    other supplier shipped in that order (semi), and NO other supplier
    shipped late in it (anti). No correlated re-execution, no row
    multiplication: both probes key on l_orderkey with a suppkey
    inequality residual; the supplier-name join broadcasts the dim."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    late3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    counted = (
        late.join(
            others,
            (F.col("o2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            late3,
            (F.col("o3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        counted.join(F.broadcast(s), counted.l_suppkey == s.s_suppkey)
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(Q21_LIMIT)
        .select("s_suppkey", "s_name", "numwait")
    )


SQL_WAITING_SUPPLIERS = f"""
WITH late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
)
SELECT s.s_suppkey, s.s_name, w.numwait
FROM (
  SELECT l1.l_suppkey, count(*) AS numwait
  FROM late l1
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey)
  GROUP BY l1.l_suppkey
) w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
ORDER BY w.numwait DESC, s.s_name ASC
LIMIT {Q21_LIMIT}
"""

RELATIONAL_QUERIES["customer_order_counts"] = q_customer_order_counts
RELATIONAL_ORACLES["customer_order_counts"] = SQL_CUSTOMER_ORDER_COUNTS
RELATIONAL_QUERIES["large_order_customers"] = q_large_order_customers
RELATIONAL_ORACLES["large_order_customers"] = SQL_LARGE_ORDER_CUSTOMERS
RELATIONAL_QUERIES["waiting_suppliers"] = q_waiting_suppliers
RELATIONAL_ORACLES["waiting_suppliers"] = SQL_WAITING_SUPPLIERS


# ---------------------------------------------------------------------------
# r09 TPC-H cross-nation trade shapes: Q7 / Q8 (region-level — the
# fixture's 25 synthetic nations make single-nation pairs empty at
# sf0.001, so the shape keeps TPC-H's two-sided OR pair predicate and
# the share-of-market ratio at region granularity, where every SF has
# members)
# ---------------------------------------------------------------------------

def q_region_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between two
    specific regions in BOTH directions, by (supplier region, customer
    region, ship year). The two-sided pair predicate stays one OR
    filter over the joined frame (never a UNION of two plans); all
    four dims broadcast; the single fact-fact join (lineitem×orders)
    is the only shuffle. DECIMAL revenue sums exact; year() is integer
    on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("sn"), F.col("n_regionkey").alias("supp_region")))
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("cn"), F.col("n_regionkey").alias("cust_region")))
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("sn"))
        .join(nc, F.col("c_nationkey") == F.col("cn"))
        .where(
            ((F.col("supp_region") == 2) & (F.col("cust_region") == 3))
            | ((F.col("supp_region") == 3) & (F.col("cust_region") == 2))
        )
        .groupBy("supp_region", "cust_region", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


SQL_REGION_TRADE_VOLUME = """
SELECT ns.n_regionkey AS supp_region, nc.n_regionkey AS cust_region,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE (ns.n_regionkey = 2 AND nc.n_regionkey = 3)
   OR (ns.n_regionkey = 3 AND nc.n_regionkey = 2)
GROUP BY ns.n_regionkey, nc.n_regionkey, year(l.l_shipdate)
"""


def q_region_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share): within one consuming market
    (EUROPE-region customers buying ECONOMY-type parts), the fraction
    of yearly revenue supplied from ASIA-region suppliers — the
    conditional-sum-over-sum ratio, computed in ONE aggregate pass
    (sum(CASE)) rather than two scans. DECIMAL sums exact; the share
    is a single double division (IEEE-deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    ns = F.broadcast(n.select(F.col("n_nationkey").alias("sn"), F.col("n_regionkey").alias("supp_region")))
    nc = F.broadcast(n.select(F.col("n_nationkey").alias("cn"), F.col("n_regionkey").alias("cust_region")))
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)") * F.lit(0).cast("decimal(18,2)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, F.col("c_nationkey") == F.col("cn"))
        .where(F.col("cust_region") == 3)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("sn"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(F.col("supp_region") == 2, rev).otherwise(zero)).alias("__n"),
            F.sum(rev).alias("__d"),
        )
        .select(
            "ship_year",
            (
                F.round(F.col("__n").cast("double") / F.col("__d").cast("double"), 6)
                + F.lit(0.0)
            ).alias("mkt_share"),
            F.col("__d").cast("double").alias("total_revenue"),
        )
    )


SQL_REGION_MARKET_SHARE = """
SELECT CAST(year(l.l_shipdate) AS INT) AS ship_year,
       round(
         CAST(sum(CASE WHEN ns.n_regionkey = 2
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) * CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) + 0.0 AS mkt_share,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey AND nc.n_regionkey = 3
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
GROUP BY year(l.l_shipdate)
"""

RELATIONAL_QUERIES["region_trade_volume"] = q_region_trade_volume
RELATIONAL_ORACLES["region_trade_volume"] = SQL_REGION_TRADE_VOLUME
RELATIONAL_QUERIES["region_market_share"] = q_region_market_share
RELATIONAL_ORACLES["region_market_share"] = SQL_REGION_MARKET_SHARE


# ---------------------------------------------------------------------------
# r09 second-session TPC-H tail: Q6 / Q14 / Q15 / Q9 / Q20 shapes —
# completes the public-suite join/agg shape inventory (every TPC-H
# query now has a fixture-adapted representative). The fixture has no
# partsupp table, so Q9's supplycost is a retailprice-derived proxy
# and Q20's availqty is the supplier's own shipped quantity; both keep
# the reference query's JOIN/nesting shape exactly.
# ---------------------------------------------------------------------------

def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): a single scan with
    every predicate pushed to parquet (date range, discount band,
    quantity cap) and ONE scalar DECIMAL aggregate — the canonical
    filter-pushdown + map-side-combine probe. No joins, no shuffle
    beyond the final scalar partial merge."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


SQL_FORECAST_REVENUE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): share of one ship-month's
    revenue from PROMO-type parts — conditional-sum-over-sum in ONE
    aggregate pass over the month's lines, part dim broadcast. The
    ratio is a single double division of exact DECIMAL sums."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)") * F.lit(0).cast("decimal(18,2)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias("__p"),
            F.sum(rev).alias("__t"),
        )
        .select(
            (
                F.round(
                    F.lit(100.0) * F.col("__p").cast("double") / F.col("__t").cast("double"), 6
                )
                + F.lit(0.0)
            ).alias("promo_pct"),
            F.col("__t").cast("double").alias("total_revenue"),
        )
    )


SQL_PROMO_REVENUE = """
SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) * CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE),
             6) + 0.0 AS promo_pct,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01'
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarter revenue per supplier
    (the Q15 view), then the suppliers tied at the maximum — the
    scalar-subquery-on-an-agg pattern. The per-supplier revenue frame
    is built ONCE and self-compared via a broadcast 1-row max (exact
    DECIMAL equality, so ties are well-defined); supplier dim
    broadcasts into the survivors."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    per = li.groupBy("l_suppkey").agg(F.sum(rev).alias("__r"))
    mx = per.agg(F.max("__r").alias("__mx"))
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        per.join(F.broadcast(mx), per.__r == mx.__mx)
        .join(s, per.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__r").cast("double").alias("total_revenue"),
        )
    )


SQL_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.r = (SELECT max(r) FROM rev)
"""


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit by (supplier
    nation, ship year) over a part-name class. The fixture has no
    partsupp, so supplycost is the deterministic proxy
    ``0.1 × p_retailprice`` — the join tree (lineitem × part(filtered,
    broadcast) × supplier(broadcast) × nation(broadcast)) and the
    amount expression rev − cost·qty keep Q9's exact shape. All money
    math DECIMAL; l_quantity is integral so cost·qty is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    amount = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    ) - _dec("p_retailprice") * F.lit(0.1).cast("decimal(18,2)") * _dec(
        "l_quantity"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("l_shipdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


SQL_NATION_PROFIT = """
SELECT n.n_name, CAST(year(l.l_shipdate) AS INT) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name, year(l.l_shipdate)
"""


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers whose own
    shipped quantity of some part exceeds 20% of that part's total —
    the nested agg-over-agg threshold feeding a SEMI join into the
    supplier dim (availqty ↦ the supplier's shipped quantity; the
    fixture has no partsupp). The threshold compare is integer-exact:
    quantities are integral, so ``5·q > t`` over DECIMAL sums has no
    float in the predicate. Per-pair and per-part aggs share one
    shuffle key prefix (l_partkey); the supplier-name join broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("__q")
    )
    tot = per.groupBy("l_partkey").agg(F.sum("__q").alias("__t"))
    dominant = (
        per.join(tot, "l_partkey")
        .where(F.lit(5).cast("decimal(18,2)") * F.col("__q") > F.col("__t"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominant_parts"))
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return dominant.join(s, dominant.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "n_dominant_parts"
    )


SQL_DOMINANT_SUPPLIERS = """
WITH per AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, sum(q) AS t FROM per GROUP BY l_partkey)
SELECT s.s_suppkey, s.s_name, d.n_dominant_parts
FROM (
  SELECT per.l_suppkey, count(*) AS n_dominant_parts
  FROM per JOIN tot ON tot.l_partkey = per.l_partkey
  WHERE CAST(5 AS DECIMAL(18,2)) * per.q > tot.t
  GROUP BY per.l_suppkey
) d
JOIN supplier s ON s.s_suppkey = d.l_suppkey
"""

RELATIONAL_QUERIES["forecast_revenue"] = q_forecast_revenue
RELATIONAL_ORACLES["forecast_revenue"] = SQL_FORECAST_REVENUE
RELATIONAL_QUERIES["promo_revenue"] = q_promo_revenue
RELATIONAL_ORACLES["promo_revenue"] = SQL_PROMO_REVENUE
RELATIONAL_QUERIES["top_supplier"] = q_top_supplier
RELATIONAL_ORACLES["top_supplier"] = SQL_TOP_SUPPLIER
RELATIONAL_QUERIES["nation_profit"] = q_nation_profit
RELATIONAL_ORACLES["nation_profit"] = SQL_NATION_PROFIT
RELATIONAL_QUERIES["dominant_suppliers"] = q_dominant_suppliers
RELATIONAL_ORACLES["dominant_suppliers"] = SQL_DOMINANT_SUPPLIERS
