"""Plan-shape regression tests via the plans helper: the shapes SURVEY §4
commits to must hold on real parquet scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.plans import plan_checks
from rosreestr_xml_to_gis_converter_spark.queries_ref import j1_classifier_join, load


def test_classifier_join_broadcasts_and_prunes(spark, sf_dir):
    pc = plan_checks(j1_classifier_join(spark, sf_dir), execute=True)
    assert pc.has_broadcast_join()
    assert pc.python_stages() == 0
    cols = pc.scan_columns()
    assert cols and set(cols) <= {"n_nationkey", "n_name", "n_regionkey"}


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey")
    )
    plan = plan_checks(df).final
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)" in plan


def test_agg_is_partial_then_final_no_python(spark, sf_dir):
    from rosreestr_xml_to_gis_converter_spark.queries_ref import a1_owner_agg

    pc = plan_checks(a1_owner_agg(spark, sf_dir), execute=True)
    assert pc.python_stages() == 0
    assert pc.final.count("HashAggregate") >= 2  # map-side partial + final


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Co-located bucketed join (sources/catalog.write_bucketed): two
    tables bucketed identically on the join key must equi-join with ZERO
    Exchange operators — the 100 TB play for the write-once/join-daily
    parcel-cover layer.  The same join on plain parquet shuffles both
    sides (control)."""
    from rosreestr_xml_to_gis_converter_spark.sources.catalog import Catalog

    spark.sql("DROP TABLE IF EXISTS b_images")
    spark.sql("DROP TABLE IF EXISTS b_cover")
    cat = Catalog(spark, str(tmp_path / "wh"))
    images = spark.range(0, 100_000).selectExpr(
        "concat('img-', id) AS image_id", "CAST(id % 997 AS LONG) AS cell"
    )
    cover = spark.range(0, 997).selectExpr(
        "CAST(id AS LONG) AS cell", "concat('cad-', id % 40) AS cad_number"
    )
    cat.write_bucketed(images, "b_images", ["cell"], n_buckets=8, sort_cols=["cell"])
    cat.write_bucketed(cover, "b_cover", ["cell"], n_buckets=8, sort_cols=["cell"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = cat.read_table("b_images").join(cat.read_table("b_cover"), "cell")
        assert joined.count() == 100_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in final, final
        assert "SortMergeJoin" in final

        # control: the identical join over non-bucketed parquet shuffles
        images.write.mode("overwrite").parquet(str(tmp_path / "plain_i"))
        cover.write.mode("overwrite").parquet(str(tmp_path / "plain_c"))
        plain = spark.read.parquet(str(tmp_path / "plain_i")).join(
            spark.read.parquet(str(tmp_path / "plain_c")), "cell"
        )
        plain.count()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan.split("== Initial Plan ==")[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_images")
        spark.sql("DROP TABLE IF EXISTS b_cover")


def test_ivf_topk_plan_broadcast_no_python(spark):
    """IVF ANN (round 3): cell assignment / probe selection are codegen'd
    Column arithmetic over the centroid literal array, the query side is
    broadcast, and NO Python stage appears anywhere in the plan — the
    corpus is touched only by JVM expressions."""
    import numpy as np

    from rosreestr_xml_to_gis_converter_spark.operators.similarity import ivf_topk

    emb = spark.range(0, 2000).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 8), i -> CAST(pmod(id * i, 97) + 1 AS FLOAT) / 97.0) AS embedding",
    )
    q = emb.filter(F.col("vec_id") < 4)
    cents = np.random.default_rng(5).standard_normal((4, 8))
    pc = plan_checks(ivf_topk(emb, q, k=3, centroids=cents, nprobe=2), execute=True)
    assert pc.python_stages() == 0
    assert pc.has_broadcast_join()


def test_owner_summary_plan_no_python(spark):
    """The full owner branch tree (round 3) stays entirely JVM-side:
    one aggregation over the rights rows (collect_set/collect_list via
    ObjectHashAggregate), no Python stage, no cartesian product."""
    import pandas as pd

    from rosreestr_xml_to_gis_converter_spark.operators.attrs import owner_summary

    rights = spark.createDataFrame(
        pd.DataFrame(
            [("d1", "Долевая собственность", "A", 2, "1/2")],
            columns=["doc_id", "right_type", "owner", "share_den", "share_text"],
        ),
        schema="doc_id string, right_type string, owner string, "
        "share_den long, share_text string",
    )
    parcels = spark.createDataFrame(
        pd.DataFrame(
            [("d1", "Прочее", "Калининский")],
            columns=["doc_id", "category", "district_name"],
        )
    )
    pc = plan_checks(owner_summary(rights, parcels), execute=True)
    assert pc.python_stages() == 0
    assert "CartesianProduct" not in pc.final
    assert "ObjectHashAggregate" in pc.final or "SortAggregate" in pc.final


def test_knn_grid_fallback_single_scan_no_shuffle(spark, sf_dir):
    """The <k-candidates whole-layer fallback must NOT rescan the image
    side (a covered/frontier union would scan it twice — the bug class
    this pins) and must add no Exchange on the big side: one parquet
    scan of lineitem, broadcast joins only."""
    from rosreestr_xml_to_gis_converter_spark.queries_engine import knn_parcels

    df = knn_parcels(spark, sf_dir)
    pc = plan_checks(df, execute=True)
    assert pc.python_stages() == 0
    # exactly ONE scan of the image-side parquet (lineitem)
    assert pc.final.count("Scan parquet") - pc.final.count("Scan parquet spark_catalog") <= 2
    assert pc.final.lower().count("lineitem") <= 2  # scan + its reuse marker at most
    # the big side never shuffles: every Exchange in the plan belongs to
    # the (tiny) centroid-side aggregations or the gate's dropDuplicates
    # -- assert the join itself is broadcast
    assert pc.has_broadcast_join()
