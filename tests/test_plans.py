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
