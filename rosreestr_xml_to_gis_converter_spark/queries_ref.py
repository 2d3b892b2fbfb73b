"""Reference-semantics operators realized on the driver's star schema.

Each function here is one operator class from SURVEY.md section 2.1,
re-expressed as a declarative DataFrame pipeline over
``/root/testdata/sf*`` tables, with an exactly-equivalent DuckDB oracle in
``ORACLES``.  Conventions that make the oracle comparison *bitwise* exact:

* money/measure sums are aggregated as integer cents
  (``CAST(round(x * 100) AS BIGINT)``) — double SUM order differs between
  engines, integer SUM cannot;
* per-row double arithmetic keeps identical operand order on both sides;
* set-aggregations sort before joining (``array_sort`` / ``list_sort``);
* every computed column is aliased identically on both sides.

Reference citations are on each function (file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- S1: source scan + filter (main.py:157-158,189) ------------------------

def s1_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_quantity") > 30)
    )


S1_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_quantity > 30
"""


# --- S3: polymorphic schema dispatch (real_estate.py:39-66) -----------------

def s3_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    schema = (
        F.when(F.col("event_type") == "purchase", "KVZU")
        .when(F.col("event_type") == "view", "KPZU")
        .when(F.col("event_type") == "click", "KVOKS")
        .when(F.col("event_type") == "signup", "land_record")
        .otherwise(F.lit(None).cast("string"))
    )
    return e.select(
        "event_id",
        schema.alias("source_schema"),
        F.when(schema.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_unsupported"),
    )


S3_SQL = """
SELECT event_id,
       CASE event_type WHEN 'purchase' THEN 'KVZU' WHEN 'view' THEN 'KPZU'
            WHEN 'click' THEN 'KVOKS' WHEN 'signup' THEN 'land_record' END
         AS source_schema,
       CASE WHEN event_type NOT IN ('purchase','view','click','signup')
            THEN 1 ELSE 0 END AS is_unsupported
FROM events
"""


# --- P1: projection + coalesce fallback chains (real_estate.py:708-711) ----

def p1_project_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.when(F.col("o_orderstatus") == "F", F.col("o_orderpriority")),
            F.lit("-"),
        ).alias("priority_or_default"),
    )


P1_SQL = """
SELECT o_orderkey,
       coalesce(CASE WHEN o_orderstatus = 'F' THEN o_orderpriority END, '-')
         AS priority_or_default
FROM orders
"""


# --- P2: predicate + error-bucket anti-join (main.py:350-352,381) -----------

def p2_filter_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bad = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(bad, li.l_orderkey == bad.o_orderkey, "left_anti")
        .select("l_orderkey", "l_linenumber")
    )


P2_SQL = """
SELECT l_orderkey, l_linenumber FROM lineitem li
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = li.l_orderkey AND o.o_orderstatus = 'F')
"""


# --- J1: classifier broadcast join + '-' default (logic.py:17-26,
#     real_estate.py:885,899) -------------------------------------------------

def j1_classifier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    cond = (F.col("n_regionkey") == F.col("r_regionkey")) & (F.col("r_regionkey") != 0)
    return (
        n.join(F.broadcast(r), cond, "left")
        .select("n_nationkey", "n_name", F.coalesce(F.col("r_name"), F.lit("-")).alias("region_label"))
    )


J1_SQL = """
SELECT n_nationkey, n_name, coalesce(r_name, '-') AS region_label
FROM nation LEFT JOIN region
  ON n_regionkey = r_regionkey AND r_regionkey <> 0
"""


# --- J2: geometry x attributes denormalization (main.py:379-412) ------------

def j2_denorm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import spread_input_by

    o = load(spark, sf_dir, "orders")
    # size-gated spread (guide §2.5): the 6-row-group lineitem scan caps
    # the fused probe+project stage at 6-way parallelism otherwise
    li = spread_input_by(load(spark, sf_dir, "lineitem"), "l_orderkey")
    rev_cents = F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .select("o_orderkey", "l_linenumber", "o_custkey", rev_cents.alias("revenue_cents"))
    )


J2_SQL = """
SELECT o_orderkey, l_linenumber, o_custkey,
       CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


# --- E1: explode entry parcels (main.py:416-454) ----------------------------

def e1_explode_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))


E1_SQL = """
SELECT doc_id, unnest(string_split(text, ' ')) AS word
FROM documents WHERE doc_id < 100
"""


# --- E2: explode + regex key split (main.py:394-406) ------------------------

def e2_explode_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    key = F.concat(
        F.col("user_id").cast("string"), F.lit("("), (F.col("event_id") % 5).cast("string"), F.lit(")")
    )
    return e.select(
        "event_id",
        key.alias("geom_key"),
        F.regexp_extract(key, r"^(\d+)\((\d+)\)$", 1).alias("cad_number"),
        F.regexp_extract(key, r"^(\d+)\((\d+)\)$", 2).alias("num_of_cont"),
    )


E2_SQL = r"""
SELECT event_id,
       concat(user_id, '(', event_id % 5, ')') AS geom_key,
       regexp_extract(concat(user_id, '(', event_id % 5, ')'), '^(\d+)\((\d+)\)$', 1) AS cad_number,
       regexp_extract(concat(user_id, '(', event_id % 5, ')'), '^(\d+)\((\d+)\)$', 2) AS num_of_cont
FROM events
"""


# --- G1: ring segmentation as windowed cumsum (real_estate.py:735-757) ------

def g1_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flag = F.when(F.col("event_type") == "signup", 1).otherwise(0)
    return e.select(
        "user_id", "event_id", F.sum(flag).over(w).alias("ring_id")
    )


G1_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ring_id
FROM events
"""


# --- G2: shoelace signed area (logic.py:71-80), fixed-point exact -----------

def g2_shoelace(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    x = F.round(F.col("value") * 100).cast("long")
    y = F.col("event_id")
    term = x * F.lead(y).over(w) - F.lead(x).over(w) * y
    return (
        e.select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg(F.sum("term").alias("area2"))
    )


G2_SQL = """
WITH v AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS x, event_id AS y,
         lead(CAST(round(value * 100) AS BIGINT)) OVER w AS xn,
         lead(event_id) OVER w AS yn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT user_id, CAST(SUM(x * yn - xn * y) AS BIGINT) AS area2 FROM v GROUP BY user_id
"""


# --- G3: orientation normalization via conditional reverse
#     (real_estate.py:764-780) ------------------------------------------------

def g3_orientation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sign = F.sum(F.round(F.col("value") * 100).cast("long") - F.lit(50)).alias("sign")
    g = e.groupBy("user_id").agg(
        F.array_sort(F.collect_list("event_id")).alias("ring"), sign
    )
    ring = F.when(F.col("sign") > 0, F.reverse(F.col("ring"))).otherwise(F.col("ring"))
    return g.select("user_id", F.array_join(ring, ",").alias("ring_csv"), "sign")


G3_SQL = """
WITH g AS (
  SELECT user_id,
         list_sort(list(event_id)) AS ring,
         CAST(SUM(CAST(round(value * 100) AS BIGINT) - 50) AS BIGINT) AS sign
  FROM events GROUP BY user_id
)
SELECT user_id,
       array_to_string(CASE WHEN sign > 0 THEN list_reverse(ring) ELSE ring END, ',') AS ring_csv,
       sign
FROM g
"""


# --- G4: last-writer-wins upsert (real_estate.py:781-782) -------------------

def g4_lww_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rosreestr_xml_to_gis_converter_spark.operators.dedupe import spread_input_by

    # spread on the window key (round 6, guide §2.5): the single-row-group
    # events parquet hands all rows to one task, serializing the map-side
    # WindowGroupLimit; the keyed repartition satisfies the window's
    # distribution so no second exchange appears
    e = spread_input_by(load(spark, sf_dir, "events"), "user_id")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


G4_SQL = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --- A1: owner aggregation (real_estate.py:183-452) -------------------------

def a1_owner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("max_price_cents"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_price_cents"),
    )


A1_SQL = """
SELECT o_custkey,
       count(*) AS n_orders,
       count(DISTINCT o_orderstatus) AS n_statuses,
       max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_price_cents,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM orders GROUP BY o_custkey
"""


# --- A2: set-dedup string agg (real_estate.py:505,529-531,556-568) ----------

def a2_set_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.array_sort(F.collect_set("source")), "; ").alias("sources"),
        F.countDistinct("source").alias("n_sources"),
    )


A2_SQL = """
SELECT lang,
       array_to_string(list_sort(list_distinct(list(source))), '; ') AS sources,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


# --- A3: conditional owner defaults (real_estate.py:363-380) ----------------

def a3_conditional_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    owner = (
        F.when(F.col("c_mktsegment") == "FURNITURE", F.lit("Собственность РФ"))
        .when(F.col("c_acctbal") < 0, F.lit("администрация района"))
        .otherwise(F.col("c_name"))
    )
    return c.select("c_custkey", owner.alias("owner"))


A3_SQL = """
SELECT c_custkey,
       CASE WHEN c_mktsegment = 'FURNITURE' THEN 'Собственность РФ'
            WHEN c_acctbal < 0 THEN 'администрация района'
            ELSE c_name END AS owner
FROM customer
"""


# --- F1: regex scalar cleanup (main.py:356-367) -----------------------------

def f1_regex_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cleaned = F.trim(F.regexp_replace(F.col("text"), r"\bthe\b", ""))
    return d.select("doc_id", cleaned.alias("text_clean"))


F1_SQL = r"""
SELECT doc_id, trim(regexp_replace(text, '\bthe\b', '', 'g')) AS text_clean
FROM documents
"""


# --- F2: ordered abbreviation rewrite (logic.py:50-68) ----------------------

_ABBREV_RULES = [
    (r"(?i)\bspark\b", "spk"),
    (r"(?i)\btable\b", "tbl"),
    (r"(?i)\bquery\b", "qry"),
    (r"(?i)\bwindow\b", "win"),
    (r"(?i)\bcustomer\b", "cust"),
]


def f2_abbrev_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    col = F.col("text")
    for pat, rep in _ABBREV_RULES:  # application order = rule order (logic.py:56)
        col = F.regexp_replace(col, pat, rep)
    return d.select("doc_id", col.alias("text_abbr"))


def _f2_sql() -> str:
    expr = "text"
    for pat, rep in _ABBREV_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS text_abbr FROM documents"


F2_SQL = _f2_sql()


# --- F3: date invert + (1,1,1) default (real_estate.py:712-715,
#     main.py:384-393) --------------------------------------------------------

def f3_date_invert(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ru = F.when(
        F.col("o_orderkey") % 97 != 0, F.date_format(F.col("o_orderdate"), "dd.MM.yyyy")
    )
    back = F.coalesce(F.to_date(ru, "dd.MM.yyyy"), F.lit("0001-01-01").cast("date"))
    # dates travel as ISO strings: the pandas/Arrow boundary renders
    # pre-1677 dates differently per engine (datetime64 range), and the
    # reference itself treats dates as strings until the sink
    return o.select(
        "o_orderkey", ru.alias("ru_date"), back.cast("string").alias("back_date")
    )


F3_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 97 <> 0 THEN strftime(o_orderdate, '%d.%m.%Y') END AS ru_date,
       CAST(coalesce(CAST(strptime(CASE WHEN o_orderkey % 97 <> 0
                                        THEN strftime(o_orderdate, '%d.%m.%Y') END,
                                   '%d.%m.%Y') AS DATE),
                     DATE '0001-01-01') AS VARCHAR) AS back_date
FROM orders
"""


# --- F4: case folding + punctuation rewrite (real_estate.py:354-362,243) ----

def f4_case_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("owner_uc"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C ")).alias("owner_rw"),
    )


F4_SQL = """
SELECT c_custkey, upper(c_name) AS owner_uc,
       replace(c_name, 'Customer#', 'C ') AS owner_rw
FROM customer
"""


# --- F5: derived file key + collision suffix (main.py:178-225) --------------

def f5_collision_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    key = F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority"))
    w = Window.partitionBy(key).orderBy("o_orderkey")
    rn = F.row_number().over(w)
    fname = F.when(rn == 1, key).otherwise(F.concat(key, F.lit("("), rn.cast("string"), F.lit(")")))
    return o.select("o_orderkey", fname.alias("file_name"))


F5_SQL = """
SELECT o_orderkey,
       CASE WHEN rn = 1 THEN key ELSE concat(key, '(', rn, ')') END AS file_name
FROM (
  SELECT o_orderkey,
         concat_ws('-', o_orderstatus, o_orderpriority) AS key,
         row_number() OVER (PARTITION BY concat_ws('-', o_orderstatus, o_orderpriority)
                            ORDER BY o_orderkey) AS rn
  FROM orders
)
"""


# --- M1: run metrics / observability counts (main.py:216-223,457-459) -------

def m1_metrics_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
    )


M1_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type
"""


REF_QUERIES = {
    "s1_scan": s1_scan,
    "s3_dispatch": s3_dispatch,
    "p1_project_coalesce": p1_project_coalesce,
    "p2_filter_anti": p2_filter_anti,
    "j1_classifier_join": j1_classifier_join,
    "j2_denorm_join": j2_denorm_join,
    "e1_explode_entry": e1_explode_entry,
    "e2_explode_regex": e2_explode_regex,
    "g1_segmentation": g1_segmentation,
    "g2_shoelace": g2_shoelace,
    "g3_orientation": g3_orientation,
    "g4_lww_upsert": g4_lww_upsert,
    "a1_owner_agg": a1_owner_agg,
    "a2_set_dedup": a2_set_dedup,
    "a3_conditional_default": a3_conditional_default,
    "f1_regex_cleanup": f1_regex_cleanup,
    "f2_abbrev_rewrite": f2_abbrev_rewrite,
    "f3_date_invert": f3_date_invert,
    "f4_case_fold": f4_case_fold,
    "f5_collision_suffix": f5_collision_suffix,
    "m1_metrics_counts": m1_metrics_counts,
}

REF_ORACLES = {
    "s1_scan": S1_SQL,
    "s3_dispatch": S3_SQL,
    "p1_project_coalesce": P1_SQL,
    "p2_filter_anti": P2_SQL,
    "j1_classifier_join": J1_SQL,
    "j2_denorm_join": J2_SQL,
    "e1_explode_entry": E1_SQL,
    "e2_explode_regex": E2_SQL,
    "g1_segmentation": G1_SQL,
    "g2_shoelace": G2_SQL,
    "g3_orientation": G3_SQL,
    "g4_lww_upsert": G4_SQL,
    "a1_owner_agg": A1_SQL,
    "a2_set_dedup": A2_SQL,
    "a3_conditional_default": A3_SQL,
    "f1_regex_cleanup": F1_SQL,
    "f2_abbrev_rewrite": F2_SQL,
    "f3_date_invert": F3_SQL,
    "f4_case_fold": F4_SQL,
    "f5_collision_suffix": F5_SQL,
    "m1_metrics_counts": M1_SQL,
}
