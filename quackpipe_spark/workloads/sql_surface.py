"""Relational SQL surface — SURVEY.md §2B parity queries.

The reference exposes the full DuckDB dialect (/root/reference
ARCHITECTURE.md:1959-1975: aggregates, complex WHERE, joins, subqueries,
window functions; BENCHMARK.md:11 group-by). Here each capability family is
expressed with the DataFrame API so Catalyst plans it (partial aggregates,
broadcast joins, top-K rewrite, pushdown), with a DuckDB oracle proving
identical semantics.

Float-output convention: aggregate doubles are rounded (2dp for money sums,
4dp for averages) because summation order differs across engines; raw
column values pass through unrounded (bitwise identical from parquet).
Event time convention: ``events.ts`` is int64 epoch-ns in Spark
(nanosAsLong) and µs TIMESTAMP in DuckDB, so comparisons normalize to µs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quackpipe_spark.functions.dialect import register_dialect

_DIALECT_SESSIONS: dict[int, SparkSession] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from quackpipe_spark.sources.tables import table_df

    return table_df(spark, sf_dir, name)


def _dialect(spark: SparkSession) -> None:
    # dict value PINS the session object: a bare id() set would alias a
    # NEW session to a dead one's entry after CPython address reuse and
    # silently skip register_dialect (unresolved-function errors later).
    # Stopped sessions' pins purge on each new registration (same
    # lifecycle fix as sources.tables._SCAN_CACHE, review r12) so a
    # process cycling many sessions doesn't accumulate dead JVM refs.
    key = id(spark)
    if _DIALECT_SESSIONS.get(key) is not spark:
        from quackpipe_spark.sources.tables import _session_alive

        for k, sess in list(_DIALECT_SESSIONS.items()):
            if not _session_alive(sess):
                _DIALECT_SESSIONS.pop(k, None)  # pop: concurrent purges race
        register_dialect(spark)
        _DIALECT_SESSIONS[key] = spark


# --- battery digests ---------------------------------------------------------
#
# The driver verifies the first 50 registry entries; to keep EVERY capability
# inside that window, related sub-queries are merged into "battery" queries.
# Each sub-result collapses to one (part, n, chk) row where chk is the sum of
# a 32-bit md5 prefix over a canonical row string — order-insensitive, pure
# map-side work plus one scalar aggregate (no collect_list, no ordered agg),
# so a battery costs exactly its sub-plans plus k single-row unions at any
# scale. The canonical form is engine-portable:
#   * double/float → floor(x*1e6 + 0.5) as BIGINT: IEEE multiply/add/floor are
#     bit-deterministic in both Spark and DuckDB at any magnitude (a decimal
#     cast is NOT: DuckDB's double→DECIMAL scales in double arithmetic and
#     drifts above 2^33).
#   * everything else → CAST AS STRING (verified identical for int/bigint/
#     string/boolean), NULL → '<null>'.
#   * hex→int via Spark conv(substr(md5(r),1,8),16,10) ≡ DuckDB
#     ('0x'||substr(md5(r),1,8))::BIGINT.

_NULL_TOKEN = "<null>"


def _row_hash(df: DataFrame) -> Column:
    cols = []
    for name, dtype in sorted(df.dtypes):
        col = F.col(name)
        if dtype in ("double", "float"):
            col = F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")
        cols.append(F.coalesce(col.cast("string"), F.lit(_NULL_TOKEN)))
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, 8), 16, 10
    ).cast("long")


def _union_digests(parts: list[tuple[str, DataFrame]]) -> DataFrame:
    """Digest N sub-results as a union of per-part GLOBAL aggregates.

    Each part collapses to one (part, n, chk) row via its own 2-stage
    SinglePartition aggregate, and the one-row results union. A fused
    alternative (project every part to (part, row-hash), union the
    narrow streams, ONE groupBy(part)) was tried in round 8 and measured
    ~0.35s SLOWER per battery at sf0.1 (grouping_battery 0.62s→0.96s,
    5-rep medians on an idle box, stable across two full bench runs):
    the digest rows are ~1-per-task either way after map-side partial
    aggregation, so the fused shape saves no data movement — and its
    wider single plan costs more to compile and stage-schedule than the
    N tiny all-to-one exchanges it removes. At cluster scale both ship
    kilobytes; the batteries exist for the driver gate, so the
    empirically faster shape wins. A global aggregate emits its row even
    on empty input, so empty parts stay present without seed rows."""
    out = None
    for part, df in parts:
        d = (
            df.select(_row_hash(df).alias("h"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("h"), F.lit(0)).cast("long").alias("chk"),
            )
            .select(F.lit(part).alias("part"), F.col("n"), F.col("chk"))
        )
        out = d if out is None else out.unionAll(d)
    return out


def _digest_sql(part: str, sub_sql: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB mirror of one _union_digests part. cols = [(name, kind)]; kind 'f' marks
    double/float columns (fixed-point canon), anything else casts to VARCHAR."""
    exprs = []
    for name, kind in sorted(cols):
        if kind == "f":
            exprs.append(
                f"coalesce(CAST(floor(({name}) * 1e6 + 0.5) AS BIGINT)::VARCHAR, '{_NULL_TOKEN}')"
            )
        else:
            exprs.append(f"coalesce(({name})::VARCHAR, '{_NULL_TOKEN}')")
    return (
        f"SELECT '{part}' AS part, count(*) AS n,\n"
        f"       CAST(coalesce(sum(('0x' || substr(md5(rowstr), 1, 8))::BIGINT), 0) AS BIGINT) AS chk\n"
        f"FROM (SELECT concat_ws(chr(31), {', '.join(exprs)}) AS rowstr\n"
        f"      FROM ({sub_sql}))"
    )


# --- aggregation -----------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: 2-key group, 8 aggregates, filter pushed to scan.

    Parity with the reference's delegated hash-agg surface
    (ARCHITECTURE.md:1971,1985-1997). Catalyst emits partial+final
    HashAggregate — map-side combine means the shuffle carries one row per
    (flag,status) per partition, which is what survives 100 TB.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan filter + single agg — the pushdown probe.

    The whole WHERE clause reaches the parquet reader as PushedFilters;
    only 3 columns are read (ReadSchema). At 100 TB this is the difference
    between scanning 3% and 100% of the table.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (delegated dialect, SURVEY §2B aggregations)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


AGG_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type
"""


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — multi-level aggregates in one pass (Catalyst
    Expand operator; one shuffle for all grouping sets)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over return flag / line status."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.avg("l_discount"), 4).alias("avg_disc")
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(avg(l_discount), 4) AS avg_disc
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("n_items") > 400)
    )


HAVING_SQL = """
SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
FROM lineitem GROUP BY l_suppkey HAVING count(*) > 400
"""


# --- joins -----------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10.

    customer is broadcast (small dim); orders⋈lineitem shuffles on the
    join key. orderBy+limit is rewritten by Catalyst to
    TakeOrderedAndProject — no global sort at scale.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # no forced broadcast: customer SCALES with SF, and its scan has a
        # file-proportional size estimate — the planner broadcasts it at
        # every tested scale and demotes safely at cluster scale (audit
        # rule 3, PLAN_AUDIT_r11.md); a hint would force it at 100 TB too
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join; dims broadcast, facts shuffle.

    The region→nation→(customer,supplier) chain stays broadcast all the
    way; only orders⋈lineitem is a shuffle join. This is the plan shape
    that survives a 1000-executor cluster.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer/supplier scale with SF → planner-chosen (audit rule 3);
        # nation (25 rows) and region (5) are bounded by the data model,
        # so their broadcasts stay forced
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving unmatched dimension rows."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_bal"),
        )
    )


JOIN_LEFT_SQL = """
SELECT n_name, count(c_custkey) AS n_customers,
       round(coalesce(sum(c_acctbal), 0), 2) AS total_bal
FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
GROUP BY n_name
"""


def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI joins: parts with lineitems vs without.

    Catalyst plans both sides as broadcast hash semi/anti joins here; at
    scale the semi-join avoids materializing the (huge) match multiplicity.
    """
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    with_li = p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", F.lit("matched").alias("status")
    )
    without_li = p.join(li, p.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", F.lit("unmatched").alias("status")
    )
    return with_li.unionAll(without_li)


JOIN_SEMI_ANTI_SQL = """
SELECT p_partkey, 'matched' AS status FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
UNION ALL
SELECT p_partkey, 'unmatched' AS status FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p.p_partkey)
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join (small×small — the only sane cardinality for one)."""
    r = _t(spark, sf_dir, "region").select("r_name")
    n = _t(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


JOIN_CROSS_SQL = "SELECT r_name, n_name FROM region CROSS JOIN nation"


def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: price-band classification of parts.

    The reference surface has no ASOF (SURVEY §2B joins); range joins via
    inequality conditions are the delegated-dialect equivalent. Bands are
    broadcast → BroadcastNestedLoopJoin, which is the right physical plan
    for a tiny band table at any scale.
    """
    p = _t(spark, sf_dir, "part")
    # literal VALUES via the SQL parser: a createDataFrame here pays py4j
    # round-trips + driver-side Arrow conversion on every plan build; the
    # parsed inline relation is pure Catalyst metadata
    bands = spark.sql(
        "SELECT * FROM VALUES ('cheap', 0.0D, 906.0D), ('mid', 906.0D, 913.0D), "
        "('expensive', 913.0D, 1e12D) AS bands(band, lo, hi)"
    )
    return (
        p.join(F.broadcast(bands), (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), F.round(F.avg("p_retailprice"), 4).alias("avg_price"))
    )


JOIN_RANGE_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('cheap', 0.0, 906.0), ('mid', 906.0, 913.0), ('expensive', 913.0, 1e12)
)
SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


# --- window functions ------------------------------------------------------

def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per type by value — ranking window (SURVEY §2B windows)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "rn", "event_id", "value")
    )


WINDOW_TOPK_SQL = """
SELECT event_type, rn, event_id, value FROM (
  SELECT event_type, event_id, value,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS INT) AS rn
  FROM events
) WHERE rn <= 3
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics per user ordered by event time (µs-normalized)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy(F.asc("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


WINDOW_LAG_SQL = """
SELECT user_id, event_id,
       round(value - lag(value) OVER w, 4) AS delta_prev,
       lead(event_type) OVER w AS next_type
FROM events WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC)
"""


def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame per customer's orders."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders WHERE o_custkey < 100
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session ids via lag + cumulative sum.

    The classic stateful-looking op expressed as two windows — fully
    parallel per user, no Python. (Streaming variant:
    quackpipe_spark.streaming uses session_window.)
    """
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    us = F.expr("ts DIV 1000")  # ns → µs, integer div (duckdb parity; /1000 in
    # double would lose sub-µs precision at epoch-ns magnitude)
    # order by the µs-TRUNCATED time + id, NOT raw ns: DuckDB's ts is a
    # µs TIMESTAMP, so two ns-distinct events in one µs tie there and
    # break on event_id — ordering by ns here would pick a different
    # session-boundary row for that pair (the asof µs-collision class)
    w = Window.partitionBy("user_id").orderBy(F.asc(us), F.asc("event_id"))
    gapped = ev.select(
        "user_id",
        "event_id",
        us.alias("ts_us"),
        (us - F.lag(us).over(w) > 1_800_000_000).cast("int").alias("is_new"),
    )
    wcum = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = gapped.withColumn(
        "session_id", F.coalesce(F.sum("is_new").over(wcum), F.lit(0)).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
    )


SESSIONIZE_SQL = """
WITH gapped AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC) > 1800000000 AS INT) AS is_new
  FROM events WHERE user_id < 200
), sess AS (
  SELECT user_id, event_id, ts_us,
         CAST(coalesce(sum(is_new) OVER (
            PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS session_id
  FROM gapped
)
SELECT user_id, session_id, count(*) AS n_events, min(ts_us) AS session_start_us
FROM sess GROUP BY user_id, session_id
"""


# --- sort / limit / top-k --------------------------------------------------

def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT — Catalyst rewrites to TakeOrderedAndProject
    (per-partition top-K + driver merge; no global sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(25)
    )


TOPK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


# --- set operations --------------------------------------------------------

def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT ALL over customer key sets — the literal
    Catalyst operator chain (Union+Deduplicate, Intersect, ExceptAll).
    Kept as the operator-coverage artifact and differentially pinned
    row-identical to the battery's fused recipe
    (:func:`set_operations_fused`) in tests/test_sql_extended.py."""
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    with_orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return building.union(rich).intersect(with_orders).exceptAll(
        c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    )


def set_operations_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same `(A UNION B) INTERSECT O EXCEPT ALL N` result as ONE tagged
    aggregate — the plan set semantics over key sets deserves at 100 TB:
    each leg projects (key, membership flags), the narrow streams union,
    and a single hash shuffle on the key folds max() flags; Intersect /
    ExceptAll would each pay their own distinct-aggregate exchanges and
    joins (5 exchanges vs 1 here, measured 7→5 stages for the battery).

    Row-identity argument (why flags suffice): INTERSECT's output is
    duplicate-free, so the following EXCEPT ALL degenerates to EXCEPT —
    a key appears (exactly once) iff it is in (A ∪ B), in O, and not in
    N. The oracle keeps the operator SQL text; DuckDB folds it the same
    way. The literal operator chain stays in :func:`set_operations`,
    differentially pinned to this recipe.

    The three customer legs further share ONE scan: per-row flag
    projection (ab = BUILDING∨rich, neg = negative) instead of one
    filtered leg each — max() over the key folds row-level flags the
    same as leg-level ones, and rows matching no predicate are dropped
    before the exchange. One customer pass instead of three."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")

    cust = c.select(
        "c_custkey",
        F.when(
            (F.col("c_mktsegment") == "BUILDING") | (F.col("c_acctbal") > 5000), 1
        )
        .otherwise(0)
        .alias("_ab"),
        F.lit(0).alias("_o"),
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).alias("_neg"),
    ).filter((F.col("_ab") + F.col("_neg")) > 0)
    u = cust.unionAll(
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            F.lit(0).alias("_ab"),
            F.lit(1).alias("_o"),
            F.lit(0).alias("_neg"),
        )
    )
    return (
        u.groupBy("c_custkey")
        .agg(
            F.max("_ab").alias("_ab"),
            F.max("_o").alias("_o"),
            F.max("_neg").alias("_neg"),
        )
        .filter((F.col("_ab") == 1) & (F.col("_o") == 1) & (F.col("_neg") == 0))
        .select("c_custkey")
    )


SET_OPS_SQL = """
(
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   UNION
   SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
  INTERSECT
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
)
EXCEPT ALL
SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""


def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (dedup without aggregation)."""
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


DISTINCT_SQL = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


# --- subqueries ------------------------------------------------------------

def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (Catalyst → left semi join)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rich_keys = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        o.join(rich_keys, o.o_custkey == rich_keys.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


SUBQUERY_IN_SQL = """
SELECT o_orderstatus, count(*) AS n FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
GROUP BY o_orderstatus
"""


def subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS (anti join): customers with no large (>350k) order.

    (Plain "never ordered" is vacuous on this data — every customer has
    orders — so the predicate includes a filter on the subquery side.)
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350_000).select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


SUBQUERY_NOT_EXISTS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000
)
"""


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery threshold (above-average filter)."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.agg(F.avg("l_quantity").alias("a"))
    return (
        li.join(F.broadcast(avg_qty))
        .filter(F.col("l_quantity") > F.col("a"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_above_avg"))
    )


SUBQUERY_SCALAR_SQL = """
SELECT l_returnflag, count(*) AS n_above_avg FROM lineitem
WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem)
GROUP BY l_returnflag
"""


def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders above their customer's average.

    Catalyst decorrelates to an aggregate + join (RewriteCorrelatedScalarSubquery)
    — expressed here directly as that plan.
    """
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("k")).agg(F.avg("o_totalprice").alias("cust_avg"))
    return (
        o.join(per_cust, o.o_custkey == per_cust.k)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


SUBQUERY_CORRELATED_SQL = """
SELECT o_orderpriority, count(*) AS n FROM orders o
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey)
GROUP BY o_orderpriority
"""


# --- expressions / dialect -------------------------------------------------

def expr_case_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN + string functions (lower/substr/length/replace/LIKE)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.substring("p_brand", 1, 5).alias("brand5"),
        F.length("p_type").alias("type_len"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.when(F.col("p_size") >= 40, "XL")
        .when(F.col("p_size") >= 20, "L")
        .when(F.col("p_size") >= 10, "M")
        .otherwise("S")
        .alias("size_class"),
        F.col("p_name").like("%green%").alias("is_green"),
    )


EXPR_CASE_SQL = """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       substring(p_brand, 1, 5) AS brand5,
       CAST(length(p_type) AS INT) AS type_len,
       replace(p_type, ' ', '_') AS type_snake,
       CASE WHEN p_size >= 40 THEN 'XL' WHEN p_size >= 20 THEN 'L'
            WHEN p_size >= 10 THEN 'M' ELSE 'S' END AS size_class,
       p_name LIKE '%green%' AS is_green
FROM part
"""


def time_bucket_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (the reference's core time-series query:
    date_trunc / time_bucket over event time, ARCHITECTURE.md:1967)."""
    _dialect(spark)
    ev = _t(spark, sf_dir, "events")
    bucket = F.expr("unix_seconds(date_trunc('HOUR', from_epoch_ns(ts)))")
    return (
        ev.groupBy(bucket.alias("bucket_s"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


TIME_BUCKET_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s, event_type,
       count(*) AS n, round(avg(value), 4) AS avg_value
FROM events GROUP BY 1, 2
"""


def epoch_ns_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """epoch_ns() time-range predicate — the reference's documented idiom
    (README.md:121: WHERE time >= epoch_ns('...'::TIMESTAMP))."""
    _dialect(spark)
    ev = _t(spark, sf_dir, "events")
    lo = F.expr("epoch_ns(timestamp'2024-01-05 00:00:00')")
    hi = F.expr("epoch_ns(timestamp'2024-01-06 00:00:00')")
    return (
        ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.min(F.expr("ts DIV 1000")).alias("first_us"))
    )


EPOCH_NS_SQL = """
SELECT event_type, count(*) AS n, min(epoch_us(ts)) AS first_us
FROM events
WHERE epoch_ns(ts) >= epoch_ns(TIMESTAMP '2024-01-05 00:00:00')
  AND epoch_ns(ts) < epoch_ns(TIMESTAMP '2024-01-06 00:00:00')
GROUP BY event_type
"""


# Synthesized URL per part, covering the variant space: http/https,
# www prefix, multi-label tld, explicit port, query, fragment — each
# present on a deterministic subset of rows so every NULL/default branch
# of the URL functions is exercised.
_CH_URL_SPARK = (
    "concat(CASE WHEN p_partkey % 2 = 0 THEN 'https' ELSE 'http' END, '://',"
    " CASE WHEN p_partkey % 4 = 0 THEN 'www.' ELSE '' END,"
    " 'shop-', CAST(p_partkey % 5 AS STRING),"
    " CASE WHEN p_partkey % 2 = 0 THEN '.example.co.uk' ELSE '.example.com' END,"
    " CASE WHEN p_partkey % 3 = 0 THEN ':8443' ELSE '' END,"
    " '/part/', CAST(p_partkey AS STRING),"
    " CASE WHEN p_partkey % 2 = 1 THEN concat('?color=', CAST(p_size AS STRING)) ELSE '' END,"
    " CASE WHEN p_partkey % 5 = 0 THEN '#spec' ELSE '' END)"
)


def ch_dialect_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse alias functions (aliases.sql:1-36 parity): casts,
    OrZero/OrNull, intDiv(=plain / — reference quirk), match(=LIKE),
    plus the chsql URL/IPv4 families (chsql community extension,
    Dockerfile:11) — all Catalyst-inlined SQL functions, no UDFs."""
    _dialect(spark)
    p = _t(spark, sf_dir, "part")
    return (
        p.withColumn("url", F.expr(_CH_URL_SPARK))
        .withColumn("ip_num", F.expr("CAST(p_partkey AS BIGINT) * 7919 % 4294967296"))
        # the synthetic part names are always-distinct fixed-arity tokens,
        # so dup_token_ratio verified as a constant 0.0 (never a real
        # ratio) — double the name on even keys so both token signals
        # carry doc-varying, nonzero values (gate-triviality audit, r14)
        .withColumn(
            "name2",
            F.expr(
                "CASE WHEN p_partkey % 2 = 0"
                " THEN concat_ws(' ', p_name, p_name) ELSE p_name END"
            ),
        )
        .select(
            "p_partkey",
            F.expr("toString(p_size)").alias("size_str"),
            F.expr("toInt64(toString(p_size))").alias("size_i64"),
            F.expr("toFloat64(toString(p_retailprice))").alias("price_f64"),
            F.expr("toInt32OrZero(p_type)").alias("bad_cast_zero"),
            F.expr("toInt32OrNull(p_type)").alias("bad_cast_null"),
            F.expr("round(intDiv(p_retailprice, 100.0), 4)").alias("price_div"),
            F.expr("match(p_name, '%red%')").alias("is_red"),
            F.expr("protocol(url)").alias("url_protocol"),
            F.expr("domain(url)").alias("url_domain"),
            F.expr("domainWithoutWWW(url)").alias("url_domain_no_www"),
            F.expr("topLevelDomain(url)").alias("url_tld"),
            F.expr("port(url)").alias("url_port"),
            F.expr("path(url)").alias("url_path"),
            F.expr("pathFull(url)").alias("url_path_full"),
            F.expr("queryString(url)").alias("url_query"),
            F.expr("fragment(url)").alias("url_fragment"),
            F.expr("IPv4NumToString(ip_num)").alias("ip_str"),
            F.expr("IPv4StringToNum(IPv4NumToString(ip_num))").alias("ip_roundtrip"),
            F.expr("hash_bucket(CAST(p_partkey AS STRING), 's0')").alias("hb"),
            F.expr("hash_sample_keep(CAST(p_partkey AS STRING), 0.25, 's0')").alias("keep25"),
            F.expr("token_count(name2)").alias("name_tokens"),
            F.expr("dup_token_ratio(name2)").alias("name_dup_ratio"),
        )
    )


_CH_URL_DUCK = _CH_URL_SPARK.replace("AS STRING", "AS VARCHAR")

CH_DIALECT_SQL = f"""
WITH u AS (
  SELECT *, {_CH_URL_DUCK} AS url,
         CAST(p_partkey AS BIGINT) * 7919 % 4294967296 AS ip_num,
         CASE WHEN p_partkey % 2 = 0
              THEN concat_ws(' ', p_name, p_name) ELSE p_name END AS name2
  FROM part
),
h AS (
  SELECT *, regexp_extract(url, '://([^/?#]+)', 1) AS authority,
         regexp_extract(url, '://([^/:?#]+)', 1) AS host
  FROM u
)
SELECT p_partkey,
       CAST(p_size AS VARCHAR) AS size_str,
       CAST(CAST(p_size AS VARCHAR) AS BIGINT) AS size_i64,
       CAST(CAST(p_retailprice AS VARCHAR) AS DOUBLE) AS price_f64,
       coalesce(try_cast(p_type AS INT), 0) AS bad_cast_zero,
       try_cast(p_type AS INT) AS bad_cast_null,
       round(p_retailprice / 100.0, 4) AS price_div,
       p_name LIKE '%red%' AS is_red,
       regexp_extract(url, '^([a-z]+)://', 1) AS url_protocol,
       host AS url_domain,
       regexp_replace(host, '^www\\.', '') AS url_domain_no_www,
       regexp_extract(host, '\\.([^.]+)$', 1) AS url_tld,
       coalesce(try_cast(regexp_extract(authority, ':([0-9]+)$', 1) AS INT), 0) AS url_port,
       regexp_extract(url, '://[^/?#]+(/[^?#]*)', 1) AS url_path,
       regexp_extract(url, '://[^/?#]+([^#]*)', 1) AS url_path_full,
       nullif(regexp_extract(url, '\\?([^#]*)', 1), '') AS url_query,
       nullif(regexp_extract(url, '#(.*)$', 1), '') AS url_fragment,
       CAST((ip_num >> 24) & 255 AS VARCHAR) || '.' || CAST((ip_num >> 16) & 255 AS VARCHAR)
         || '.' || CAST((ip_num >> 8) & 255 AS VARCHAR) || '.' || CAST(ip_num & 255 AS VARCHAR) AS ip_str,
       ip_num AS ip_roundtrip,
       CAST(('0x' || substr(md5('s0|' || CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT % 10000 AS INT) AS hb,
       ('0x' || substr(md5('s0|' || CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT % 10000 < 2500 AS keep25,
       CAST(len(string_split_regex(trim(lower(name2)), '\\s+')) AS INT) AS name_tokens,
       round(1 - len(list_distinct(string_split_regex(trim(lower(name2)), '\\s+')))
             / greatest(len(string_split_regex(trim(lower(name2)), '\\s+')), 1)::DOUBLE, 4) AS name_dup_ratio
FROM h
"""


def ch_dialect_datetime_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chsql long-tail audit (r11): date helpers beyond the hour family
    (week/month/quarter/year starts with CH mode-0 Sunday weeks, CH
    Monday=1 toDayOfWeek, toYYYYMMDDhhmmss), arithmetic aliases
    (plus/minus/modulo/intDivOrZero), the plain toFloat cast family and
    the reference's exact 'toUInt*rZero/rNull' spellings
    (aliases.sql:24-35), and the JSON extract family over the events
    props column — all Catalyst-inlined SQL functions, no UDFs."""
    _dialect(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    t = "from_epoch_ns(ts)"
    return ev.select(
        "event_id",
        # the dialect functions return DATE (CH contract; unit-tested);
        # stringified here because pandas renders DuckDB DATEs as
        # midnight Timestamps, which would false-mismatch the comparator
        F.expr(f"CAST(toStartOfMonth({t}) AS STRING)").alias("month_start"),
        F.expr(f"CAST(toStartOfQuarter({t}) AS STRING)").alias("quarter_start"),
        F.expr(f"CAST(toStartOfYear({t}) AS STRING)").alias("year_start"),
        F.expr(f"CAST(toStartOfWeek({t}) AS STRING)").alias("week_start"),
        F.expr(f"toQuarter({t})").alias("qtr"),
        F.expr(f"toDayOfYear({t})").alias("doy"),
        F.expr(f"toDayOfWeek({t})").alias("dow"),
        F.expr(f"toYYYYMMDDhhmmss({t})").alias("ts_num"),
        F.expr("round(plus(value, 1.5), 4)").alias("v_plus"),
        F.expr("round(minus(value, 1.5), 4)").alias("v_minus"),
        F.expr("modulo(event_id, 7)").alias("mod7"),
        F.expr("intDivOrZero(value, 0.0)").alias("div0"),
        F.expr("round(intDivOrZero(value, 2.0), 4)").alias("div2"),
        F.expr("toFloat(toString(round(value, 3)))").alias("v_f"),
        F.expr("toUInt16rZero(event_type)").alias("uint_zero"),
        F.expr("toUInt16rNull(event_type)").alias("uint_null"),
        F.expr("JSONHas(props, 'k')").alias("has_k"),
        F.expr("JSONHas(props, 'missing')").alias("has_missing"),
        F.expr("JSONExtractInt(props, 'k')").alias("k_int"),
        F.expr("JSONExtractString(props, 'k')").alias("k_str"),
        F.expr("JSONExtractFloat(props, 'k')").alias("k_float"),
    )


CH_DATETIME_JSON_SQL = """
SELECT event_id,
       CAST(CAST(date_trunc('month', ts) AS DATE) AS VARCHAR) AS month_start,
       CAST(CAST(date_trunc('quarter', ts) AS DATE) AS VARCHAR) AS quarter_start,
       CAST(CAST(date_trunc('year', ts) AS DATE) AS VARCHAR) AS year_start,
       CAST(CAST(CAST(ts AS DATE) - INTERVAL (dayofweek(ts)) DAY AS DATE) AS VARCHAR) AS week_start,
       CAST(quarter(ts) AS INT) AS qtr,
       CAST(dayofyear(ts) AS INT) AS doy,
       CAST(isodow(ts) AS INT) AS dow,
       CAST(year(ts) * 10000000000 + month(ts) * 100000000 + day(ts) * 1000000
            + hour(ts) * 10000 + minute(ts) * 100 + CAST(floor(second(ts)) AS BIGINT)
            AS BIGINT) AS ts_num,
       round(value + 1.5, 4) AS v_plus,
       round(value - 1.5, 4) AS v_minus,
       CAST(event_id % 7 AS BIGINT) AS mod7,
       0.0 AS div0,
       round(value / 2.0, 4) AS div2,
       CAST(CAST(round(value, 3) AS VARCHAR) AS DOUBLE) AS v_f,
       CAST(coalesce(try_cast(event_type AS INT), 0) AS INT) AS uint_zero,
       try_cast(event_type AS INT) AS uint_null,
       coalesce(list_contains(json_keys(props), 'k'), false) AS has_k,
       coalesce(list_contains(json_keys(props), 'missing'), false) AS has_missing,
       try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       json_extract_string(props, '$.k') AS k_str,
       try_cast(json_extract_string(props, '$.k') AS DOUBLE) AS k_float
FROM events
WHERE user_id < 50
"""


def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per user across event types (explicit values →
    no extra distinct-discovery job; matches oracle CASE aggregation).
    Four REAL corpus types (click/view/purchase/signup) carry varying
    counts; 'login' does not exist in the corpus and is kept DELIBERATELY
    as the all-zero column pinning the explicit-values + na.fill(0)
    zero-fill path (a second absent type was redundant coverage — the
    gate-triviality audit swapped it for a real one)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    types = ["click", "view", "purchase", "signup", "login"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside pivot
        .na.fill(0, types)
    )


PIVOT_SQL = """
SELECT user_id,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (WHERE event_type = 'login') AS BIGINT) AS login
FROM events WHERE user_id < 100 GROUP BY user_id
"""


# --- extended function surface ---------------------------------------------

def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id (SQL path — also exercises
    spark.sql over registered views, the /query endpoint's engine)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def quantiles_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90) per group — both
    engines use linear interpolation; rounded to absorb fp noise."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


QUANTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(min(value), 4) AS vmin,
       round(max(value), 4) AS vmax
FROM events GROUP BY event_type
"""


def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is unordered by contract,
    so sort the array before joining — the deterministic-listagg idiom."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


STRING_AGG_SQL = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey
"""


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access (the reference preloads DuckDB's json extension,
    merge/merge.go:24) — get_json_object + from_json typed extraction."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        )
        .filter(F.col("k_val") > 90)
    )


JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
"""


def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface; sqrt/power/mod are IEEE-exact, ln/exp rounded
    to absorb libm ulp differences across engines."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(-price).alias("abs_p"),
        F.ceil(price).cast("long").alias("ceil_p"),
        F.floor(price).cast("long").alias("floor_p"),
        F.round(F.sqrt(price), 6).alias("sqrt_p"),
        F.round(F.pow(F.col("l_discount") + 1.0, 2), 8).alias("pow_d"),
        F.round(F.log(price), 8).alias("ln_p"),
        F.round(F.log10(price), 8).alias("log10_p"),
        (F.col("l_partkey") % 7).alias("mod_p"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_d"),
    )


MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(-l_extendedprice) AS abs_p,
       CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
       CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
       round(sqrt(l_extendedprice), 6) AS sqrt_p,
       round(pow(l_discount + 1.0, 2), 8) AS pow_d,
       round(ln(l_extendedprice), 8) AS ln_p,
       round(log10(l_extendedprice), 8) AS log10_p,
       l_partkey % 7 AS mod_p,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d
FROM lineitem WHERE l_orderkey < 100
"""


def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface over order dates. Day-of-week uses the ISO
    convention via weekday()+1 — Spark's dayofweek() counts Sunday=1 while
    DuckDB's counts Sunday=0, so the portable form is ISO."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        (F.weekday(d) + 1).alias("isodow"),
        F.quarter(d).alias("q"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).alias("days_to_98"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("q_start"),
    )


DATE_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(isodow(o_orderdate) AS INT) AS isodow,
       CAST(quarter(o_orderdate) AS INT) AS q,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       CAST(date_diff('day', o_orderdate::DATE, DATE '1998-01-01') AS INT) AS days_to_98,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS q_start
FROM orders WHERE o_orderkey < 200
"""


def union_by_name_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-by-name with missing-column null fill — the reader-facing
    face of schema-on-write (data_store.go:94-141; readers use
    union_by_name=true, merge_service_fs.go:215)."""
    c = _t(spark, sf_dir, "customer")
    old_gen = c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey", "c_name")
    new_gen = c.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    return old_gen.unionByName(new_gen, allowMissingColumns=True)


UNION_BY_NAME_SQL = """
SELECT c_custkey, c_name, NULL::DOUBLE AS c_acctbal FROM customer WHERE c_custkey % 2 = 0
UNION ALL BY NAME
SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 1
"""


def intersect_all_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics — duplicates preserved), the
    literal Catalyst IntersectAll operator. Kept as the operator-coverage
    artifact and differentially pinned row-identical to the battery's
    fused recipe (:func:`intersect_all_fused`) in tests/test_sql_extended."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 10).select("l_orderkey")
    b = li.filter(F.col("l_discount") > 0.02).select("l_orderkey")
    return a.intersectAll(b)


def intersect_all_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL as ONE tagged aggregate: each key's output
    multiplicity is min(count_a, count_b), so union the tagged legs, count
    both sides in a single hash shuffle, and replicate each surviving key
    min-count times (explode over a sequence — the same ReplicateRows
    device Catalyst's own IntersectAll physical plan uses). One exchange
    instead of a per-side distinct-count aggregate each plus a join; at
    scale the replicate factor is the key's duplicate count, which the
    operator's output carries anyway.

    Both legs read the SAME table, so they also share one scan: per-row
    side flags (_a = qty>10, _b = disc>0.02) replace the two filtered
    legs — sum() over the key yields the identical per-side counts, and
    rows matching neither predicate drop before the exchange. Halves
    the heaviest scan in the battery (lineitem, read twice before)."""
    li = _t(spark, sf_dir, "lineitem")
    u = li.select(
        "l_orderkey",
        F.when(F.col("l_quantity") > 10, 1).otherwise(0).alias("_a"),
        F.when(F.col("l_discount") > 0.02, 1).otherwise(0).alias("_b"),
    ).filter((F.col("_a") + F.col("_b")) > 0)
    return (
        u.groupBy("l_orderkey")
        .agg(F.sum("_a").alias("_na"), F.sum("_b").alias("_nb"))
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0))
        .select(
            "l_orderkey",
            F.explode(F.sequence(F.lit(1), F.least("_na", "_nb"))).alias("_i"),
        )
        .select("l_orderkey")
    )


INTERSECT_ALL_SQL = """
SELECT l_orderkey FROM lineitem WHERE l_quantity > 10
INTERSECT ALL
SELECT l_orderkey FROM lineitem WHERE l_discount > 0.02
"""


def sql_cte_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH-clause SQL through the raw SQL entry point (the /query path:
    spark.sql over registered views, README.md:117-133)."""
    for t in ("orders", "customer"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        WITH big AS (
          SELECT o_custkey, count(*) AS n_big FROM orders
          WHERE o_totalprice > 100000 GROUP BY o_custkey
        )
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(sum(n_big) AS BIGINT) AS total_big_orders
        FROM big JOIN customer ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        """
    )


SQL_CTE_SQL = """
WITH big AS (
  SELECT o_custkey, count(*) AS n_big FROM orders
  WHERE o_totalprice > 100000 GROUP BY o_custkey
)
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(n_big) AS BIGINT) AS total_big_orders
FROM big JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def approx_count_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL), oracle-matched via an exact+tolerance
    contract: the raw HLL estimate is engine-specific (sketch internals
    differ), but the CONTRACT — "the estimate is within the configured
    error of the exact count" — is engine-checkable. Each engine emits
    per group the exact distinct count plus a boolean computed from ITS
    OWN estimate vs ITS OWN exact count; identical rows/schema/hash when
    both sketches honor their bound. Spark rsd=0.02 (≈2% stderr), DuckDB
    HLL ≈0.4%: tolerance 6% = 3σ for the looser engine. The tight <5%
    numeric check stays in tests/test_sql_extended.py."""
    ev = _t(spark, sf_dir, "events")
    exact = F.count_distinct("user_id")
    approx = F.approx_count_distinct("user_id", 0.02)
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        F.count("*").alias("n"),
        (F.abs(approx - exact) <= 0.06 * exact).alias("within_tolerance"),
    )


APPROX_DISTINCT_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       CAST(count(*) AS BIGINT) AS n,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         <= 0.06 * count(DISTINCT user_id) AS within_tolerance
FROM events
GROUP BY event_type
"""


def window_analytics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first_value / nth_value — the
    rest of the analytic-window family (SURVEY §2B windows)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest"),
    )


WINDOW_ANALYTICS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(o_orderkey) OVER w AS cheapest_order,
       nth_value(o_orderkey, 2) OVER w AS second_cheapest
FROM orders WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract / replace / rlike / count."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("BRUSHED|POLISHED").alias("is_finished"),
        F.regexp_count("p_name", F.lit("e")).cast("long").alias("n_e"),
    )


REGEXP_SQL = r"""
SELECT p_partkey,
       regexp_extract(p_type, '^(\w+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(p_type, 'BRUSHED|POLISHED') AS is_finished,
       CAST(len(regexp_extract_all(p_name, 'e')) AS BIGINT) AS n_e
FROM part
"""


def array_agg_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array functions: collect distinct sets, sort,
    index, and size them (rendered to string for portability)."""
    o = _t(spark, sf_dir, "orders")
    statuses = F.array_sort(F.collect_set("o_orderstatus"))
    return o.groupBy("o_orderpriority").agg(
        F.array_join(statuses, "|").alias("statuses"),
        F.size(statuses).cast("long").alias("n_statuses"),
        F.element_at(statuses, 1).alias("first_status"),
    )


ARRAY_AGG_SQL = """
WITH agg AS (
  SELECT o_orderpriority, list_sort(list(DISTINCT o_orderstatus)) AS st
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       array_to_string(st, '|') AS statuses,
       CAST(len(st) AS BIGINT) AS n_statuses,
       st[1] AS first_status
FROM agg
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated count by priority (semi join)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < "1996-10-01"
    ).select("l_orderkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00')
GROUP BY o_orderpriority
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation by bucket."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-ratio aggregate over a dim join."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    return (
        # part scales with SF → planner-chosen broadcast (audit rule 3)
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(promo, rev).otherwise(0.0)) / F.sum(rev), 4
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics battery: aggregates skip nulls, count(*) vs count(col),
    coalesce/nullif, and null-safe equality (IS [NOT] DISTINCT FROM)."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    joined = n.join(c, n.n_nationkey == c.c_nationkey, "left")
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_rows"),
        F.count("c_acctbal").alias("n_nonnull"),
        F.round(F.coalesce(F.avg("c_acctbal"), F.lit(-1.0)), 4).alias("avg_or_sentinel"),
        F.sum(F.expr("CASE WHEN c_mktsegment IS DISTINCT FROM 'BUILDING' THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n_not_building_nullsafe"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias("n_nullif"),
    )


NULL_SEMANTICS_SQL = """
SELECT n_name,
       count(*) AS n_rows,
       count(c_acctbal) AS n_nonnull,
       round(coalesce(avg(c_acctbal), -1.0), 4) AS avg_or_sentinel,
       CAST(sum(CASE WHEN c_mktsegment IS DISTINCT FROM 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_not_building_nullsafe,
       count(nullif(c_mktsegment, 'BUILDING')) AS n_nullif
FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
GROUP BY n_name
"""


def order_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST ordering — the reference's comparator sorts
    nulls first (column.go:87-89); Spark ASC defaults nulls-first while
    DuckDB defaults nulls-last, so portability requires saying it."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    per_nation = (
        c.groupBy("c_nationkey").agg(F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )
    return (
        n.join(per_nation, n.n_nationkey == per_nation.c_nationkey, "left")
        .select("n_name", "avg_bal")
        .orderBy(F.asc_nulls_first("avg_bal"), F.asc("n_name"))
        .limit(10)
    )


ORDER_NULLS_SQL = """
SELECT n_name, avg_bal
FROM nation LEFT JOIN (
  SELECT c_nationkey, round(avg(c_acctbal), 2) AS avg_bal
  FROM customer GROUP BY c_nationkey
) p ON n_nationkey = p.c_nationkey
ORDER BY avg_bal ASC NULLS FIRST, n_name ASC
LIMIT 10
"""


# --- batteries ---------------------------------------------------------------
# Each battery folds a family of sub-queries into one digest result so the
# whole 50-entry registry fits the driver's correctness window. Sub-queries
# keep their standalone functions (unit tests and plan tests still exercise
# them directly); the battery is the driver-facing aggregation.


def join_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER + SEMI/ANTI + CROSS join family (SURVEY §2B joins)."""
    return _union_digests(
        [
            ("left_outer", join_left_outer(spark, sf_dir)),
            ("semi_anti", join_semi_anti(spark, sf_dir)),
            ("cross", join_cross(spark, sf_dir)),
        ]
    )


JOIN_BATTERY_SQL = "\nUNION ALL\n".join(
    [
        _digest_sql(
            "left_outer",
            JOIN_LEFT_SQL,
            [("n_name", "s"), ("n_customers", "s"), ("total_bal", "f")],
        ),
        _digest_sql("semi_anti", JOIN_SEMI_ANTI_SQL, [("p_partkey", "s"), ("status", "s")]),
        _digest_sql("cross", JOIN_CROSS_SQL, [("r_name", "s"), ("n_name", "s")]),
    ]
)


def set_ops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION/INTERSECT/EXCEPT (+ALL) + DISTINCT family (SURVEY §2B set ops)."""
    return _union_digests(
        [
            ("set_ops", set_operations_fused(spark, sf_dir)),
            ("distinct", distinct_values(spark, sf_dir)),
            ("intersect_all", intersect_all_fused(spark, sf_dir)),
        ]
    )


SET_OPS_BATTERY_SQL = "\nUNION ALL\n".join(
    [
        _digest_sql("set_ops", SET_OPS_SQL, [("c_custkey", "s")]),
        _digest_sql(
            "distinct", DISTINCT_SQL, [("o_orderstatus", "s"), ("o_orderpriority", "s")]
        ),
        _digest_sql("intersect_all", INTERSECT_ALL_SQL, [("l_orderkey", "s")]),
    ]
)


def subquery_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT EXISTS / scalar / correlated subquery family (SURVEY §2B)."""
    return _union_digests(
        [
            ("in", subquery_in(spark, sf_dir)),
            ("not_exists", subquery_not_exists(spark, sf_dir)),
            ("scalar", subquery_scalar(spark, sf_dir)),
            ("correlated", subquery_correlated(spark, sf_dir)),
        ]
    )


SUBQUERY_BATTERY_SQL = "\nUNION ALL\n".join(
    [
        _digest_sql("in", SUBQUERY_IN_SQL, [("o_orderstatus", "s"), ("n", "s")]),
        _digest_sql(
            "not_exists", SUBQUERY_NOT_EXISTS_SQL, [("c_custkey", "s"), ("c_name", "s")]
        ),
        _digest_sql(
            "scalar", SUBQUERY_SCALAR_SQL, [("l_returnflag", "s"), ("n_above_avg", "s")]
        ),
        _digest_sql(
            "correlated", SUBQUERY_CORRELATED_SQL, [("o_orderpriority", "s"), ("n", "s")]
        ),
    ]
)


def window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking / lag-lead / running-frame / analytic window family
    (SURVEY §2B windows; sessionize_events stays standalone)."""
    return _union_digests(
        [
            ("topk", window_topk_per_group(spark, sf_dir)),
            ("lag_delta", window_lag_delta(spark, sf_dir)),
            ("running", window_running_frame(spark, sf_dir)),
            ("analytics", window_analytics_battery(spark, sf_dir)),
        ]
    )


WINDOW_BATTERY_SQL = "\nUNION ALL\n".join(
    [
        _digest_sql(
            "topk",
            WINDOW_TOPK_SQL,
            [("event_type", "s"), ("rn", "s"), ("event_id", "s"), ("value", "f")],
        ),
        _digest_sql(
            "lag_delta",
            WINDOW_LAG_SQL,
            [("user_id", "s"), ("event_id", "s"), ("delta_prev", "f"), ("next_type", "s")],
        ),
        _digest_sql(
            "running",
            WINDOW_RUNNING_SQL,
            [("o_custkey", "s"), ("o_orderkey", "s"), ("running_total", "f")],
        ),
        _digest_sql(
            "analytics",
            WINDOW_ANALYTICS_SQL,
            [
                ("o_custkey", "s"),
                ("o_orderkey", "s"),
                ("quartile", "s"),
                ("pct_rank", "f"),
                ("cume", "f"),
                ("cheapest_order", "s"),
                ("second_cheapest", "s"),
            ],
        ),
    ]
)


def grouping_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP / CUBE / GROUPING SETS + HAVING + DISTINCT-aggregate family —
    Catalyst Expand, one shuffle per sub-plan for all grouping sets
    (SURVEY §2B aggregations)."""
    return _union_digests(
        [
            ("rollup", rollup_orders(spark, sf_dir)),
            ("cube", cube_lineitem(spark, sf_dir)),
            ("gsets", grouping_sets_orders(spark, sf_dir)),
            ("having", having_filter(spark, sf_dir)),
            ("distinct_agg", agg_distinct(spark, sf_dir)),
        ]
    )


GROUPING_BATTERY_SQL = "\nUNION ALL\n".join(
    [
        _digest_sql(
            "rollup",
            ROLLUP_SQL,
            [("o_orderstatus", "s"), ("o_orderpriority", "s"), ("n", "s"), ("total", "f")],
        ),
        _digest_sql(
            "cube",
            CUBE_SQL,
            [("l_returnflag", "s"), ("l_linestatus", "s"), ("n", "s"), ("avg_disc", "f")],
        ),
        _digest_sql(
            "gsets",
            GROUPING_SETS_SQL,
            [
                ("o_orderstatus", "s"),
                ("o_orderpriority", "s"),
                ("g_status", "s"),
                ("g_prio", "s"),
                ("n", "s"),
            ],
        ),
        _digest_sql(
            "having",
            HAVING_SQL,
            [("l_suppkey", "s"), ("n_items", "s"), ("total_qty", "f")],
        ),
        _digest_sql(
            "distinct_agg",
            AGG_DISTINCT_SQL,
            [("event_type", "s"), ("n_users", "s"), ("n_events", "s"), ("sum_value", "f")],
        ),
    ]
)


def sort_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ... LIMIT top-k (TakeOrderedAndProject) + explicit
    NULLS FIRST ordering (SURVEY §2B sorts/limits)."""
    return _union_digests(
        [
            ("topk", topk_orders(spark, sf_dir)),
            ("nulls_order", order_nulls_first(spark, sf_dir)),
        ]
    )


SORT_BATTERY_SQL = "\nUNION ALL\n".join(
    [
        _digest_sql("topk", TOPK_SQL, [("o_orderkey", "s"), ("o_totalprice", "f")]),
        _digest_sql(
            "nulls_order", ORDER_NULLS_SQL, [("n_name", "s"), ("avg_bal", "f")]
        ),
    ]
)


def scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/string, math, date, regex, JSON scalar-function families plus
    the collection aggregates (ordered string_agg, array collect/sort/
    index) — all SURVEY §2B functions in one digest row. The collection
    parts were folded in from the former collect_agg_battery driver row
    (r7) to free a registry slot for ann_topk_pq under the 50-row cap."""
    return _union_digests(
        [
            ("case_strings", expr_case_strings(spark, sf_dir)),
            ("math", math_functions(spark, sf_dir)),
            ("date", date_functions(spark, sf_dir)),
            ("regexp", regexp_functions(spark, sf_dir)),
            ("json", json_extract_props(spark, sf_dir)),
            ("string_agg", string_agg_ordered(spark, sf_dir)),
            ("array_agg", array_agg_ops(spark, sf_dir)),
        ]
    )


SCALAR_BATTERY_SQL = "\nUNION ALL\n".join(
    [
        _digest_sql(
            "string_agg", STRING_AGG_SQL, [("n_regionkey", "s"), ("nations", "s")]
        ),
        _digest_sql(
            "array_agg",
            ARRAY_AGG_SQL,
            [
                ("o_orderpriority", "s"),
                ("statuses", "s"),
                ("n_statuses", "s"),
                ("first_status", "s"),
            ],
        ),
        _digest_sql(
            "case_strings",
            EXPR_CASE_SQL,
            [
                ("p_partkey", "s"),
                ("name_lower", "s"),
                ("brand5", "s"),
                ("type_len", "s"),
                ("type_snake", "s"),
                ("size_class", "s"),
                ("is_green", "s"),
            ],
        ),
        _digest_sql(
            "math",
            MATH_SQL,
            [
                ("l_orderkey", "s"),
                ("l_linenumber", "s"),
                ("abs_p", "f"),
                ("ceil_p", "s"),
                ("floor_p", "s"),
                ("sqrt_p", "f"),
                ("pow_d", "f"),
                ("ln_p", "f"),
                ("log10_p", "f"),
                ("mod_p", "s"),
                ("sign_d", "f"),
            ],
        ),
        _digest_sql(
            "date",
            DATE_SQL,
            [
                ("o_orderkey", "s"),
                ("y", "s"),
                ("m", "s"),
                ("dom", "s"),
                ("isodow", "s"),
                ("q", "s"),
                ("month_end", "s"),
                ("days_to_98", "s"),
                ("due_date", "s"),
                ("q_start", "s"),
            ],
        ),
        _digest_sql(
            "regexp",
            REGEXP_SQL,
            [
                ("p_partkey", "s"),
                ("first_word", "s"),
                ("devoweled", "s"),
                ("is_finished", "s"),
                ("n_e", "s"),
            ],
        ),
        _digest_sql("json", JSON_EXTRACT_SQL, [("event_id", "s"), ("k_val", "s")]),
    ]
)


# Registry note: the driver records CORRECTNESS rows for the first 50
# queries() entries across ALL workload modules; related sub-queries are
# merged into the *_battery entries so the full surface (this module +
# llm_ops + dataflow + timeseries = 50 keys) is driver-verified every round.
QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q6_forecast_revenue": q6_forecast_revenue,
    "grouping_battery": grouping_battery,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_regional_volume": q5_regional_volume,
    "join_battery": join_battery,
    "join_range_nonequi": join_range_nonequi,
    "window_battery": window_battery,
    "sessionize_events": sessionize_events,
    "sort_battery": sort_battery,
    "set_ops_battery": set_ops_battery,
    "subquery_battery": subquery_battery,
    "scalar_battery": scalar_battery,
    "time_bucket_events": time_bucket_events,
    "epoch_ns_range": epoch_ns_range,
    "ch_dialect_functions": ch_dialect_functions,
    # ch_dialect_datetime_json is differential-tested locally
    # (tests/test_sql_extended.py) rather than registered: the driver
    # gate records exactly 50 rows and every slot is taken — adding a
    # 51st would silently push another family out of the window.
    "pivot_event_types": pivot_event_types,
    "quantiles_by_group": quantiles_by_group,
    "union_by_name_schema_evolution": union_by_name_schema_evolution,
    "sql_cte_text": sql_cte_text,
    "approx_count_distinct_events": approx_count_distinct_events,
    "q4_order_priority": q4_order_priority,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q14_promo_revenue": q14_promo_revenue,
    "null_semantics": null_semantics,
}

ORACLE = {
    "q1_pricing_summary": Q1_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "grouping_battery": GROUPING_BATTERY_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_regional_volume": Q5_SQL,
    "join_battery": JOIN_BATTERY_SQL,
    "join_range_nonequi": JOIN_RANGE_SQL,
    "window_battery": WINDOW_BATTERY_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "sort_battery": SORT_BATTERY_SQL,
    "set_ops_battery": SET_OPS_BATTERY_SQL,
    "subquery_battery": SUBQUERY_BATTERY_SQL,
    "scalar_battery": SCALAR_BATTERY_SQL,
    "time_bucket_events": TIME_BUCKET_SQL,
    "epoch_ns_range": EPOCH_NS_SQL,
    "ch_dialect_functions": CH_DIALECT_SQL,
    "pivot_event_types": PIVOT_SQL,
    "quantiles_by_group": QUANTILES_SQL,
    "union_by_name_schema_evolution": UNION_BY_NAME_SQL,
    "sql_cte_text": SQL_CTE_SQL,
    "approx_count_distinct_events": APPROX_DISTINCT_SQL,
    "q4_order_priority": Q4_SQL,
    "q12_shipmode_priority": Q12_SQL,
    "q14_promo_revenue": Q14_SQL,
    "null_semantics": NULL_SEMANTICS_SQL,
}
