"""Table catalog abstraction: Iceberg when the runtime jar is on the
classpath, parquet directories otherwise (this offline environment).

The engine's sinks are *tables*, not files (SURVEY.md section 2.1 K1/K2
map the reference's shapefile/XLSX writers to Iceberg tables).  All
call-sites use this facade so the storage swap is one line; semantics
kept identical: append, dynamic partition overwrite, read-back.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class Catalog:
    """Minimal table catalog: name -> storage location."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse.rstrip("/")
        self.use_iceberg = iceberg_available(spark)

    def _path(self, table: str) -> str:
        return f"{self.warehouse}/{table}"

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        partition_by: list[str] | None = None,
    ) -> None:
        if self.use_iceberg:  # pragma: no cover - jar absent offline
            from pyspark.sql.functions import col

            writer = df.writeTo(f"local.{table}")
            if partition_by:
                writer = writer.partitionedBy(*[col(c) for c in partition_by])
            # append to a missing table creates it (the parquet branch's
            # mode="append" semantics); exercised by
            # tests/test_iceberg_optional.py when the jar is present
            if mode == "append" and self.exists(table):
                writer.append()
            else:
                writer.createOrReplace()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:  # pragma: no cover
            return self.spark.read.table(f"local.{table}")
        return self.spark.read.parquet(self._path(table))

    def exists(self, table: str) -> bool:
        if self.use_iceberg:  # pragma: no cover
            return self.spark.catalog.tableExists(f"local.{table}")
        return os.path.exists(self._path(table))

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Write a BUCKETED table (Hive layout parquet; Iceberg maps this
        to a bucket partition transform).

        The 100 TB design move this enables: two tables bucketed the same
        way on the join key (e.g. images and parcel covers on ``cell``)
        equi-join with NO shuffle of either side — SortMergeJoin reads
        bucket i of both tables on the same executor.  At a 10^12-row
        image table that deletes the single largest cost of the flagship
        join; the shuffle is paid once at write time and amortized over
        every subsequent join, which is the right trade for a layer that
        is written once and joined daily.  Plan-shape test:
        tests/test_plans.py asserts zero Exchange operators.
        """
        if self.use_iceberg:  # pragma: no cover - jar absent offline
            # Iceberg's bucket partition transform carries the same
            # co-location contract (hash % n): EVERY bucket column gets
            # its own bucket(n, col) transform, so rows equal on the full
            # key tuple land in the same partition and a join on that
            # tuple reads aligned partitions.  (Spark's bucket() helper
            # is single-column; per-column transforms give n^k partitions
            # vs the parquet branch's n tuple-hash buckets — co-location
            # holds either way, and identity-partitioning the extra
            # columns, which would explode on high-cardinality keys, is
            # exactly what this avoids.)  sort_cols become the TABLE sort
            # order (WRITE ORDERED BY) before the data lands: Iceberg's
            # writer plans its own distribution+ordering from the table
            # sort order, so a client-side sortWithinPartitions would be
            # re-sorted away — the DDL order is the one that actually
            # reaches the data files, mirroring the parquet branch's
            # sortBy.  Exercised by the guarded
            # tests/test_iceberg_optional.py when the runtime jar is on
            # the classpath.
            from pyspark.sql.functions import bucket, col

            name = f"local.{table}"
            parts = [
                bucket(n_buckets, col(bucket_cols[0])),
                *[bucket(n_buckets, col(c)) for c in bucket_cols[1:]],
            ]
            if mode != "append" or not self.exists(table):
                # (re)create EMPTY with spec + sort order, then append
                df.limit(0).writeTo(name).partitionedBy(*parts).createOrReplace()
                if sort_cols:
                    self.spark.sql(
                        f"ALTER TABLE {name} WRITE ORDERED BY"
                        f" ({', '.join(sort_cols)})"
                    )
            df.writeTo(name).append()
            return
        w = (
            df.write.mode(mode)
            .format("parquet")
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            w = w.sortBy(*sort_cols)
        # bucketBy requires saveAsTable (metastore records the bucket spec)
        w.option("path", self._path(table)).saveAsTable(table)

    def read_table(self, table: str) -> DataFrame:
        """Read a metastore-registered (bucketed) table by name."""
        if self.use_iceberg:  # pragma: no cover - jar absent offline
            return self.spark.read.table(f"local.{table}")
        return self.spark.read.table(table)
