"""Owner-aggregation matrix golden tests (reference branch families,
real_estate.py:183-452)."""

from __future__ import annotations

import pandas as pd
import pytest

from rosreestr_xml_to_gis_converter_spark.operators.attrs import owner_summary

SH = "Долевая собственность"
JT = "Совместная собственность"


def _run(spark, rights_rows, parcels_rows):
    rights = spark.createDataFrame(
        pd.DataFrame(rights_rows, columns=["doc_id", "right_type", "owner", "share_den"]),
        schema="doc_id string, right_type string, owner string, share_den long",
    )
    parcels = spark.createDataFrame(
        pd.DataFrame(parcels_rows, columns=["doc_id", "category", "district_name"]),
        schema="doc_id string, category string, district_name string",
    )
    return {r.doc_id: r.owner for r in owner_summary(rights, parcels).collect()}


def test_branch_matrix(spark):
    rights = [
        # d1: single shared owner
        ("d1", SH, "Иванов Иван", 2),
        # d2: two owners with shares (max denominator wins)
        ("d2", SH, "Иванов Иван", 150),
        ("d2", SH, "Петров Пётр", 150),
        # d3: many owners with shares
        ("d3", SH, "Иванов Иван", 300),
        ("d3", SH, "Петров Пётр", 300),
        ("d3", SH, "Сидоров Олег", 300),
        # d4: many owners, no shares
        ("d4", SH, "А Б", None),
        ("d4", SH, "В Г", None),
        ("d4", SH, "Д Е", None),
        # d5: duplicate names in different case count once
        ("d5", SH, "ИВАНОВ ИВАН", 5),
        ("d5", SH, "Иванов Иван", 5),
        # d6: joint ownership
        ("d6", JT, "Иванов Иван", None),
        ("d6", JT, "Иванова Анна", None),
        # d7: plain ownership pairs
        ("d7", "Собственность", 'ООО "Ромашка"', None),
    ]
    parcels = [
        ("d1", "Земли населённых пунктов", "Калининский"),
        ("d2", "Земли населённых пунктов", "Калининский"),
        ("d3", "Земли населённых пунктов", "Калининский"),
        ("d4", "Земли населённых пунктов", "Калининский"),
        ("d5", "Земли населённых пунктов", "Калининский"),
        ("d6", "Земли населённых пунктов", "Калининский"),
        ("d7", "Земли населённых пунктов", "Калининский"),
        ("d8", "Земли лесного фонда", "Калининский"),   # no rights
        ("d9", "Земли населённых пунктов", "Калининский"),  # adm fallback -ий
        ("d10", "Земли населённых пунктов", "Лесной"),      # adm fallback -ой
    ]
    got = _run(spark, rights, parcels)
    assert got["d1"] == f"{SH} Иванов Иван"
    assert got["d2"] == f"{SH} Иванов Иван, Петров Пётр (150 долей)"
    assert got["d3"] == f"{SH} (300 долей; 3 правообладателей)"
    assert got["d4"] == f"{SH} (3 правообладателей)"
    assert got["d5"] == f"{SH} Иванов Иван"  # case-folded dedup -> 1 owner
    assert got["d6"] == f"{JT} Иванов Иван, Иванова Анна"
    assert got["d7"] == 'Собственность ООО "Ромашка"'
    assert got["d8"] == "Собственность РФ"  # forest fund default
    assert got["d9"] == "Администрация Калининского района"
    assert got["d10"] == "Администрация Лесного района"


def test_water_fund_default_and_empty(spark):
    got = _run(
        spark,
        [("dx", SH, "X", 1)],
        [("dw", "Земли водного фонда", "Калининский"), ("dn", "Прочее", "123")],
    )
    assert got["dw"] == "Собственность РФ"
    assert got["dn"] == ""  # no declension match -> empty owner
