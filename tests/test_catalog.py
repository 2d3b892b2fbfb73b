"""Catalog facade: parquet fallback semantics (Iceberg jar absent here)."""

from __future__ import annotations

from rosreestr_xml_to_gis_converter_spark.sources.catalog import Catalog, iceberg_available


def test_catalog_roundtrip_append_overwrite(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    assert not cat.exists("t1")
    df = spark.range(10).withColumnRenamed("id", "k")
    cat.write(df, "t1", mode="overwrite")
    assert cat.exists("t1")
    assert cat.read("t1").count() == 10
    cat.write(df, "t1", mode="append")
    assert cat.read("t1").count() == 20
    cat.write(df, "t1", mode="overwrite")
    assert cat.read("t1").count() == 10


def test_catalog_partitioned_write(spark, tmp_path):
    from pyspark.sql import functions as F

    cat = Catalog(spark, str(tmp_path))
    df = spark.range(100).withColumn("p", F.pmod("id", F.lit(4)))
    cat.write(df, "t2", mode="overwrite", partition_by=["p"])
    got = cat.read("t2")
    assert got.count() == 100
    # partition pruning: only one directory read
    one = got.filter(F.col("p") == 2)
    assert one.count() == 25
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan


def test_iceberg_detection_is_false_offline(spark):
    assert iceberg_available(spark) is False
