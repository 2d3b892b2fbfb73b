"""Owner-aggregation matrix golden tests — one fixture per reference
branch of real_estate.py:183-452, including the list_doli_ga
(hectare-text share) sub-branches and the reference's quirks (no-space
concat :410-411, IndexError fall-throughs :421-422)."""

from __future__ import annotations

import pandas as pd
import pytest

from rosreestr_xml_to_gis_converter_spark.operators.attrs import owner_summary

SH = "Долевая собственность"
JT = "Совместная собственность"
MISSING = "ДАННЫЕ О ПРАВООБЛАДАТЕЛЕ ОТСУТСТВУЮТ"


def _run(spark, rights_rows, parcels_rows):
    rights = spark.createDataFrame(
        pd.DataFrame(
            rights_rows,
            columns=["doc_id", "right_type", "owner", "share_den", "share_text"],
        ),
        schema="doc_id string, right_type string, owner string, "
        "share_den long, share_text string",
    )
    parcels = spark.createDataFrame(
        pd.DataFrame(parcels_rows, columns=["doc_id", "category", "district_name"]),
        schema="doc_id string, category string, district_name string",
    )
    return {r.doc_id: r.owner for r in owner_summary(rights, parcels).collect()}


def _parcels(ids, category="Земли населённых пунктов", district="Калининский"):
    return [(d, category, district) for d in ids]


def test_numeric_share_branches(spark):
    """B1 + B3a-e (real_estate.py:382-386, 404-422)."""
    rights = [
        # B1: exactly one right row, one owner
        ("b1", SH, "Иванов Иван", 2, "1/2"),
        # B3e: two owner rows, two numeric shares -> 'type: d1 N1, d2 N2'
        ("b3e", SH, "Иванов Иван", 150, "1/150"),
        ("b3e", SH, "Петров Пётр", 150, "2/150"),
        # B3c: >2 owner rows with shares -> count text
        ("b3c", SH, "Иванов Иван", 300, "1/300"),
        ("b3c", SH, "Петров Пётр", 300, "2/300"),
        ("b3c", SH, "Сидоров Олег", 300, "3/300"),
        # B3b: 1 distinct owner over 2 rows -> no-space quirk (:410-411)
        ("b3b", SH, "ИВАНОВ ИВАН", 5, "1/5"),
        ("b3b", SH, "Иванов Иван", 5, "2/5"),
        # B3b overflow: 1 distinct owner over 3 rows -> reference
        # IndexError (list_dolevikov_new built only for <3 rows) -> ''
        ("b3x", SH, "Иванов Иван", 7, "1/7"),
        ("b3x", SH, "Иванов Иван", 7, "2/7"),
        ("b3x", SH, "Иванов Иван", 7, "3/7"),
        # B3a: the missing-owner marker
        ("b3a", SH, MISSING, 9, "1/9"),
        ("b3a", SH, MISSING, 9, "2/9"),
        # proportional share texts contribute no share (:210-214)
        ("bp", SH, "Иванов Иван", None, "пропорционально размеру общей площади"),
        ("bp", SH, "Петров Пётр", None, "пропорционально размеру общей площади"),
    ]
    got = _run(spark, rights, _parcels(["b1", "b3e", "b3c", "b3b", "b3x", "b3a", "bp"]))
    assert got["b1"] == f"{SH} Иванов Иван"
    assert got["b3e"] == f"{SH}: 1/150 Иванов Иван, 2/150 Петров Пётр"
    assert got["b3c"] == f"{SH} (300 долей; 3 правообладателей)"
    assert got["b3b"] == f"{SH} (5 долей)Иванов Иван"
    assert got["b3x"] == ""
    assert got["b3a"] == f"{SH} (9 долей; данные о правообладателях отсутствуют)"
    # no usable shares and 2 owners -> the :423-425 count fall-through
    assert got["bp"] == f"{SH} (2 правообладателей)"


def test_doli_ga_branches(spark):
    """B2a-e — the hectare-text share sub-branches (real_estate.py:387-402)."""
    rights = [
        # B2a: all shares ga, <=2 owner rows -> 'type ga1 o1, ga2 o2'
        ("g2a", SH, "Иванов Иван", None, "10 га"),
        ("g2a", SH, "Петров Пётр", None, "12 га"),
        # B2b: all shares ga, >2 owner rows -> count text
        ("g2b", SH, "Иванов Иван", None, "1 га"),
        ("g2b", SH, "Петров Пётр", None, "2 га"),
        ("g2b", SH, "Сидоров Олег", None, "3 га"),
        # B2c (>2 distinct): ga + numeric mixed -> 'долей; N' text
        ("g2c", SH, "Иванов Иван", None, "10 га"),
        ("g2c", SH, "Петров Пётр", 40, "1/40"),
        ("g2c", SH, "Сидоров Олег", 40, "2/40"),
        ("g2c", SH, "Андреев Юрий", None, None),
        # B2c (2 distinct): ga + numeric -> 'Name1, Name2 (D долей)'
        ("g2c2", SH, "Иванов Иван", None, "10 га"),
        ("g2c2", SH, "Петров Пётр", 25, "1/25"),
        ("g2c2", SH, "Иванов Иван", None, None),
        # B2d: ga rows + share-less rows, >2 distinct owners
        ("g2d", SH, "Иванов Иван", None, "10 га"),
        ("g2d", SH, "Петров Пётр", None, None),
        ("g2d", SH, "Сидоров Олег", None, None),
        ("g2d", SH, "Андреев Юрий", None, None),
        # B2e: ga rows + share-less rows, <=2 distinct owners -> upper set
        ("g2e", SH, "Иванов Иван", None, "10 га"),
        ("g2e", SH, "Петров Пётр", None, None),
    ]
    got = _run(spark, rights, _parcels(["g2a", "g2b", "g2c", "g2c2", "g2d", "g2e"]))
    assert got["g2a"] == f"{SH} 10 га Иванов Иван, 12 га Петров Пётр"
    assert got["g2b"] == f"{SH} (3 правообладателей)"
    assert got["g2c"] == f"{SH} (40 долей; 4 правообладателей)"
    assert got["g2c2"] == f"{SH} Иванов Иван, Петров Пётр (25 долей)"
    assert got["g2d"] == f"{SH} (4 правообладателей)"
    assert got["g2e"] == f"{SH} (ИВАНОВ ИВАН, ПЕТРОВ ПЁТР)"


def test_joint_plain_and_defaults(spark):
    rights = [
        # joint ownership
        ("d6", JT, "Иванов Иван", None, None),
        ("d6", JT, "Иванова Анна", None, None),
        # plain ownership pairs
        ("d7", "Собственность", 'ООО "Ромашка"', None, None),
        # B4: shared right rows with zero owners -> bare type (:426-431)
        ("d11", SH, None, None, None),
    ]
    parcels = _parcels(["d6", "d7", "d11"]) + [
        ("d8", "Земли лесного фонда", "Калининский"),  # no rights
        ("d9", "Земли населённых пунктов", "Калининский"),  # adm fallback -ий
        ("d10", "Земли населённых пунктов", "Лесной"),  # adm fallback -ой
    ]
    got = _run(spark, rights, parcels)
    assert got["d6"] == f"{JT} Иванов Иван, Иванова Анна"
    assert got["d7"] == 'Собственность ООО "Ромашка"'
    assert got["d11"] == SH
    assert got["d8"] == "Собственность РФ"  # forest fund default
    assert got["d9"] == "Администрация Калининского района"
    assert got["d10"] == "Администрация Лесного района"


def test_water_fund_default_and_empty(spark):
    got = _run(
        spark,
        [("dx", SH, "X", 1, "1/1")],
        [("dw", "Земли водного фонда", "Калининский"), ("dn", "Прочее", "123")],
    )
    assert got["dw"] == "Собственность РФ"
    assert got["dn"] == ""  # no declension match -> empty owner


def test_share_text_column_optional(spark):
    """Extracts carrying only Share attrs (no ShareText) still aggregate."""
    rights = spark.createDataFrame(
        pd.DataFrame(
            [("d1", SH, "Иванов Иван", 4)],
            columns=["doc_id", "right_type", "owner", "share_den"],
        ),
        schema="doc_id string, right_type string, owner string, share_den long",
    )
    parcels = spark.createDataFrame(
        pd.DataFrame(
            [("d1", "Прочее", "Калининский")],
            columns=["doc_id", "category", "district_name"],
        )
    )
    got = {r.doc_id: r.owner for r in owner_summary(rights, parcels).collect()}
    assert got["d1"] == f"{SH} Иванов Иван"
