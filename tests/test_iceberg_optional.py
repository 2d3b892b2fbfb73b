"""Guarded Iceberg-path exercise (round-4 VERDICT next-round #8).

The Catalog facade claims the storage swap is one line: parquet
directories offline, Iceberg tables when ``iceberg-spark-runtime`` is on
the classpath.  In this sandbox the jar is absent, so every test here
SKIPS — but when run on a cluster image that ships the jar, they
configure a Hadoop-warehouse Iceberg catalog named ``local`` (the name
the facade's Iceberg branch targets) at runtime (v2 catalogs resolve
lazily from SQLConf, so no session rebuild is needed) and prove:

* ``write`` / ``read`` / append semantics match the parquet fallback;
* ``write_bucketed`` produces a table whose partition spec carries the
  ``bucket(n, key)`` transform (the co-location contract the parquet
  branch records via the metastore bucket spec);
* checkpoint-style appends accumulate rows exactly like
  ``CheckpointedWriter``'s per-group parquet appends.

No behavior change offline: the module is import-safe and pytest shows
the tests as skipped.
"""

from __future__ import annotations

import pytest

from rosreestr_xml_to_gis_converter_spark.sources.catalog import (
    Catalog,
    iceberg_available,
)


@pytest.fixture()
def ice_catalog(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    # v2 catalog configs are resolved lazily on first reference, so a
    # runtime conf.set is enough — no session rebuild.
    spark.conf.set(
        "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", str(tmp_path / "ice_wh"))
    yield Catalog(spark, str(tmp_path / "unused_parquet_wh"))
    for t in ("t_rt", "t_bk", "t_bk2", "t_first", "t_ckpt"):
        spark.sql(f"DROP TABLE IF EXISTS local.{t}")


def test_iceberg_roundtrip_and_append(ice_catalog, spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    ice_catalog.write(df, "t_rt", mode="overwrite")
    assert ice_catalog.read("t_rt").count() == 10
    ice_catalog.write(df, "t_rt", mode="append")
    assert ice_catalog.read("t_rt").count() == 20


def test_iceberg_bucketed_write_records_bucket_transform(ice_catalog, spark):
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("cell"), (F.col("id") * 2).alias("v")
    )
    ice_catalog.write_bucketed(df, "t_bk", ["cell"], n_buckets=8)
    assert ice_catalog.read_table("t_bk").count() == 100
    # the partition spec must carry the bucket transform — that IS the
    # co-location contract write_bucketed exists for
    spec = spark.sql("DESCRIBE EXTENDED local.t_bk").toPandas().to_string()
    assert "bucket(8, cell)" in spec


def test_iceberg_checkpoint_style_appends(ice_catalog, spark):
    from pyspark.sql import functions as F

    base = spark.range(64).select(
        F.col("id").alias("k"), F.pmod("id", F.lit(4)).alias("bucket")
    )
    # per-group appends, exactly the CheckpointedWriter write loop shape
    for group in ([0, 1], [2, 3]):
        part = base.filter(F.col("bucket").isin(group))
        ice_catalog.write(
            part, "t_ckpt", mode="append" if group[0] else "overwrite"
        )
    got = ice_catalog.read("t_ckpt")
    assert got.count() == 64
    assert got.groupBy("bucket").count().count() == 4


def test_iceberg_multicol_bucket_and_sort(ice_catalog, spark):
    """Multi-column bucketing must bucket EVERY key column (per-column
    bucket transforms, n^k partitions) — never identity-partition the
    tail columns, which explodes on high-cardinality keys — and
    sort_cols must land as the table sort order APPLIED to the written
    files (a client-side sortWithinPartitions is re-sorted away by
    Iceberg's own write distribution+ordering, so file-level evidence is
    the only honest check)."""
    from pyspark.sql import functions as F

    df = spark.range(200).select(
        F.col("id").alias("cell"),
        (F.col("id") % 37).alias("other"),
        F.col("id").alias("v"),
    )
    ice_catalog.write_bucketed(
        df, "t_bk2", ["cell", "other"], n_buckets=4, sort_cols=["v"]
    )
    assert ice_catalog.read_table("t_bk2").count() == 200
    spec = spark.sql("DESCRIBE EXTENDED local.t_bk2").toPandas().to_string()
    assert "bucket(4, cell)" in spec
    assert "bucket(4, other)" in spec
    # every data file was written under a non-default sort order
    files = spark.sql(
        "SELECT sort_order_id FROM local.t_bk2.files"
    ).toPandas()
    assert len(files) > 0 and (files["sort_order_id"] != 0).all()


def test_iceberg_append_creates_missing_table(ice_catalog, spark):
    """mode='append' on a table that does not exist yet must create it —
    the parquet branch's append semantics (CheckpointedWriter's first
    write is an append)."""
    df = spark.range(8).withColumnRenamed("id", "k")
    ice_catalog.write(df, "t_first", mode="append")
    assert ice_catalog.read("t_first").count() == 8
    ice_catalog.write_bucketed(
        spark.range(8).withColumnRenamed("id", "cell"),
        "t_first_bk",
        ["cell"],
        n_buckets=2,
        mode="append",
    )
    assert ice_catalog.read_table("t_first_bk").count() == 8
    spark.sql("DROP TABLE IF EXISTS local.t_first_bk")
