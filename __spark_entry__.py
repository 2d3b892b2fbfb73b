"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial join on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md section 2 with DuckDB oracles (rows-only for the ops whose
hashing/engine internals SQL cannot express — see queries_engine.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rosreestr_xml_to_gis_converter_spark.queries_engine import (  # noqa: E402
    ENGINE_ORACLES,
    ENGINE_QUERIES,
    flagship_spatial_join,
)
from rosreestr_xml_to_gis_converter_spark.queries_extra import (  # noqa: E402
    EXTRA_ORACLES,
    EXTRA_QUERIES,
)
from rosreestr_xml_to_gis_converter_spark.queries_ingest import (  # noqa: E402
    INGEST_ORACLES,
    INGEST_QUERIES,
)
from rosreestr_xml_to_gis_converter_spark.queries_ref import (  # noqa: E402
    REF_ORACLES,
    REF_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: images (derived from lineitem, input_hint shape) x
    H3-analog-indexed parcel layer -> exact containment rows."""
    return flagship_spatial_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**REF_QUERIES, **ENGINE_QUERIES, **EXTRA_QUERIES, **INGEST_QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**REF_ORACLES, **ENGINE_ORACLES, **EXTRA_ORACLES, **INGEST_ORACLES}
