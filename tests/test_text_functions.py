"""Reference string/date function semantics (golden, order-dependence)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.functions.text import (
    apply_abbreviations,
    clean_whitespace,
    collision_suffix,
    fold_owner_name,
    from_ru_date,
    to_ru_date,
)


def _one(spark, col):
    return spark.createDataFrame(pd.DataFrame({"x": [None]})).select(col.alias("v")).first().v


def test_abbreviation_order_matters(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["Московская область"]}))
    ordered = [("Московская область", "МО"), ("область", "обл.")]
    reversed_rules = list(reversed(ordered))
    a = df.select(apply_abbreviations(F.col("s"), ordered).alias("v")).first().v
    b = df.select(apply_abbreviations(F.col("s"), reversed_rules).alias("v")).first().v
    assert a == "МО"
    assert b == "Московская обл."  # earlier rule rewrote the suffix first


def test_abbreviations_case_insensitive(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["УЛИЦА ленина, Улица Мира"]}))
    out = df.select(apply_abbreviations(F.col("s"), [("улица", "ул.")]).alias("v")).first().v
    assert out == "ул. ленина, ул. Мира"


def test_ru_date_roundtrip_and_default(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"d": ["2020-05-17", None]}), schema="d string"
    ).select(F.col("d").cast("date").alias("d"))
    out = df.select(
        to_ru_date(F.col("d")).alias("ru"),
        from_ru_date(to_ru_date(F.col("d"))).cast("string").alias("back"),
    ).collect()
    assert out[0].ru == "17.05.2020" and out[0].back == "2020-05-17"
    assert out[1].ru is None and out[1].back == "0001-01-01"


def test_clean_whitespace(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["  a\r\nb  "]}))
    assert df.select(clean_whitespace(F.col("s")).alias("v")).first().v == "a b"


def test_fold_owner_name(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ['ООО "Ромашка", ИНН 123']}))
    assert (
        df.select(fold_owner_name(F.col("s")).alias("v")).first().v
        == 'ООО "РОМАШКА" ИНН 123'
    )


def test_collision_suffix(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["f", "f", "f", "g"]}))
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy("k").orderBy(F.monotonically_increasing_id()))
    out = sorted(
        r.v for r in df.select(collision_suffix(F.col("k"), rn).alias("v")).collect()
    )
    assert out == ["f", "f(2)", "f(3)", "g"]
