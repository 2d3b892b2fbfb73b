"""General OLAP operators beyond the reference's own surface.

SURVEY.md §2.1 notes the reference has no SQL surface, set ops, grouping
sets, pivot, ranking, or sessionization — and that where the engine needs
them they are new design on stock Spark.  Each is oracle-checked like the
rest of the gate; the integer-cents discipline from queries_ref applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.queries_ref import load


# --- set operations ----------------------------------------------------------

def setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    furn = c.filter(F.col("c_mktsegment") == "FURNITURE").select("c_custkey")
    debt = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    ex = furn.exceptAll(debt).distinct().select(F.lit("except").alias("op"), "c_custkey")
    inter = furn.intersect(debt).select(F.lit("intersect").alias("op"), "c_custkey")
    return ex.unionByName(inter)


SETOPS_SQL = """
SELECT 'except' AS op, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_acctbal < 0)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_acctbal < 0)
"""


# --- cube / rollup -----------------------------------------------------------

def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum(qty_cents).alias("qty_cents")
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("price_cents"),
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --- pivot -------------------------------------------------------------------

def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    return (
        li.withColumn("qc", qty_cents)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("qc")
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


PIVOT_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'O'
                THEN CAST(round(l_quantity * 100) AS BIGINT) END) AS BIGINT) AS qty_o,
       CAST(sum(CASE WHEN l_linestatus = 'F'
                THEN CAST(round(l_quantity * 100) AS BIGINT) END) AS BIGINT) AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


# --- sessionization ----------------------------------------------------------

_GAP_MS = 6 * 3600 * 1000


def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events -> per-user session count with a 6h inactivity gap (the
    lag + cumulative-flag pattern; streaming twin is session_window)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts arrives TIMESTAMP_NTZ; session TZ is pinned UTC, so the cast
    # interprets it exactly like DuckDB's naive epoch_ms
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    new_session = F.when(prev_ms.isNull() | (ms - prev_ms > _GAP_MS), 1).otherwise(0)
    sessions = e.select("user_id", new_session.alias("ns"))
    return sessions.groupBy("user_id").agg(F.sum("ns").alias("n_sessions"))


SESSIONIZATION_SQL = f"""
WITH s AS (
  SELECT user_id,
         CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
                OR epoch_ms(ts) - lag(epoch_ms(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_MS}
              THEN 1 ELSE 0 END AS ns
  FROM events)
SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions FROM s GROUP BY user_id
"""


# --- top-k per group ---------------------------------------------------------

def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 2)
        .select("o_custkey", "o_orderkey", "rank")
    )


TOPK_SQL = """
SELECT o_custkey, o_orderkey, rank FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders) WHERE rank <= 2
"""


EXTRA_QUERIES = {
    "setops": setops,
    "cube_agg": cube_agg,
    "rollup_agg": rollup_agg,
    "pivot_agg": pivot_agg,
    "sessionization": sessionization,
    "topk_per_group": topk_per_group,
}

EXTRA_ORACLES = {
    "setops": SETOPS_SQL,
    "cube_agg": CUBE_SQL,
    "rollup_agg": ROLLUP_SQL,
    "pivot_agg": PIVOT_SQL,
    "sessionization": SESSIONIZATION_SQL,
    "topk_per_group": TOPK_SQL,
}
