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


# --- randomized parity vs a sequential mirror --------------------------------

EG = "Общая долевая собственность"


def _py_initcap(s):
    return " ".join(w[:1].upper() + w[1:].lower() for w in s.split(" "))


def _concat_ws(*parts):
    return " ".join(p for p in parts if p is not None)


def _owner_reference(rows, category, district):
    """Sequential mirror of operators/attrs.owner_summary (which mirrors
    real_estate.py:183-452): same aggregates, same branch order, same
    documented deviations (sorted lists, max-type gate)."""
    def prop(t):
        return t is not None and "пропорциональн" in t

    nj = [r for r in rows if r[0] is not None and r[0] != JT]
    numeric = [r for r in rows if r[0] == SH and r[2] is not None and not prop(r[3])]
    ga = [
        r for r in rows
        if r[0] == SH and r[2] is None and r[3] is not None and not prop(r[3])
    ]
    n_all = len(rows)
    n_type_rows = len(nj)
    n_rows = len([r for r in nj if r[1] is not None])
    n_owners = len({r[1].upper() for r in nj if r[1] is not None})
    names = sorted({_py_initcap(r[1]) for r in nj if r[1] is not None})
    names_uc = sorted({r[1].upper() for r in nj if r[1] is not None})
    max_den = max((r[2] for r in numeric), default=None)
    n_dolei, n_ga = len(numeric), len(ga)
    ga_pairs = sorted(_concat_ws(r[3], r[1]) for r in ga)
    num_pairs = sorted(
        _concat_ws(r[3], _py_initcap(r[1]) if r[1] is not None else None)
        for r in numeric
    )
    has_missing = any(r[1] is not None and r[1].upper() == MISSING for r in rows)
    rts = [r[0] for r in rows if r[0] is not None]
    right_type = max(rts) if rts else None
    all_names = sorted({_py_initcap(r[1]) for r in rows if r[1] is not None})
    pairs = sorted({_concat_ws(r[0], r[1]) for r in rows})

    if n_all == 0:
        if category in ("Земли лесного фонда", "Земли водного фонда"):
            return "Собственность РФ"
        return "Администрация Калининского района" if district == "Калининский" else ""
    sh = right_type == SH
    if sh and n_type_rows == 1 and n_rows == 1:
        return _concat_ws(right_type, names[0])
    if sh and n_ga > 0 and n_ga == n_rows and n_rows <= 2:
        return SH + " " + ", ".join(ga_pairs)
    if sh and n_ga > 0 and n_ga == n_rows:
        return f"{SH} ({n_owners} правообладателей)"
    if sh and n_ga > 0 and n_dolei > 0 and n_owners > 2:
        return f"{SH} ({max_den} долей; {n_owners} правообладателей)"
    if sh and n_ga > 0 and n_dolei > 0 and n_owners == 2:
        return f"{SH} {', '.join(names[:2])} ({max_den} долей)"
    if sh and n_ga > 0 and n_dolei > 0:
        return ""
    if sh and n_ga > 0 and n_owners > 2:
        return f"{SH} ({n_owners} правообладателей)"
    if sh and n_ga > 0:
        return f"{SH} ({', '.join(names_uc)})"
    if sh and n_dolei > 0 and n_owners == 1 and has_missing:
        return f"{SH} ({max_den} долей; данные о правообладателях отсутствуют)"
    if sh and n_dolei > 0 and n_owners == 1 and n_rows <= 2:
        return f"{SH} ({max_den} долей){names[0]}"
    if sh and n_dolei > 0 and n_owners == 1:
        return ""
    if sh and n_dolei > 0 and n_rows > 2:
        return f"{SH} ({max_den} долей; {n_owners} правообладателей)"
    if sh and n_dolei > 0 and n_rows == 1:
        return f"{SH} {num_pairs[0]}"
    if sh and n_dolei >= 2:
        return f"{SH}: {', '.join(num_pairs)}"
    if sh and n_dolei > 0:
        return ""
    if sh and n_owners > 0:
        return f"{SH} ({n_owners} правообладателей)"
    if sh and n_rows == 0:
        return right_type
    eg_rows = [r for r in rows if r[0] == EG]
    eg_hold = [r for r in eg_rows if r[1] is not None]
    eg_n = len(eg_hold)
    eg_nshare = len([r for r in eg_hold if r[3] is not None])
    eg_dens = [r[2] for r in eg_rows if r[2] is not None]
    eg_pairs = sorted(_concat_ws(r[3], r[1]) for r in eg_hold)
    eg_other = len(
        [r for r in rows if r[0] is not None and r[0] != EG and r[1] is not None]
    )
    egrn = right_type == EG and eg_other == 0
    if egrn and eg_n > 2 and eg_dens:
        return f"{EG}({max(eg_dens)} долей; {eg_n} правообладателей)"
    if egrn and eg_n > 2:
        return f"{EG} ; {eg_n} правообладателей)"
    if egrn and eg_n == 2 and eg_nshare in (0, 2):
        return f"{EG}: {', '.join(eg_pairs)}"
    if egrn and eg_n == 1:
        return f"{EG}: {eg_pairs[0]}"
    if egrn and eg_n > 0:
        return ""
    if egrn:
        return EG
    if right_type == JT:
        return JT + " " + ", ".join(all_names)
    return ", ".join(pairs)


def test_randomized_parity_vs_sequential_mirror(spark):
    """300 random docs spanning the whole branch space, one Spark job,
    compared doc-by-doc against the sequential mirror (seeded -> exactly
    reproducible)."""
    import random

    rng = random.Random(20260817)
    types = [SH, SH, SH, JT, "Собственность", None, EG, EG]
    owners = [None, "иванов иван", "ПЕТРОВ ПЁТР", "Сидоров Олег", "Андреев Юрий", MISSING]
    docs = {}
    rights_rows, parcels_rows = [], []
    for i in range(300):
        did = f"doc{i}"
        n = rng.randint(0, 5)
        rows = []
        for _ in range(n):
            rt = rng.choice(types)
            owner = rng.choice(owners)
            kind = rng.randint(0, 3)
            if kind == 0:
                den, text = None, None
            elif kind == 1:
                den = rng.choice([2, 5, 150])
                text = f"1/{den}"
            elif kind == 2:
                den, text = None, rng.choice(["10 га", "0.5 га"])
            else:
                den, text = None, "пропорционально размеру общей площади"
            rows.append((rt, owner, den, text))
            rights_rows.append((did, rt, owner, den, text))
        category = rng.choice(["Земли лесного фонда", "Прочее"])
        parcels_rows.append((did, category, "Калининский"))
        docs[did] = _owner_reference(rows, category, "Калининский")

    got = _run(spark, rights_rows, parcels_rows)
    mismatches = {d: (got[d], docs[d]) for d in docs if got[d] != docs[d]}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


def test_egrn_shared_branches(spark):
    """The EGRN owner tree (real_estate.py:1210-1239) — one fixture per
    branch, including the no-space-paren and stray-paren quirks."""
    rights = [
        # >2 holders with denominators -> 'type(D долей; N правообладателей)'
        ("e1", EG, "Иванов Иван Иванович", 10, "1/10"),
        ("e1", EG, "Петров Пётр Петрович", 10, "2/10"),
        ("e1", EG, "Сидоров Олег", 10, "3/10"),
        # >2 holders, no denominators -> 'type ; N правообладателей)'
        ("e2", EG, "Иванов Иван", None, None),
        ("e2", EG, "Петров Пётр", None, None),
        ("e2", EG, "Сидоров Олег", None, None),
        # 2 holders, 2 shares -> 'type: s1 h1, s2 h2'
        ("e3", EG, "Иванов Иван", 5, "1/5"),
        ("e3", EG, "Петров Пётр", 5, "4/5"),
        # 2 holders, 0 shares -> 'type: h1, h2'
        ("e4", EG, "Иванов Иван", None, None),
        ("e4", EG, "Петров Пётр", None, None),
        # 1 holder, 1 share -> 'type: s1 h1'
        ("e5", EG, "ООО Поле ИНН: 7709", 5, "2/5"),
        # 1 holder, no share -> 'type: h1'
        ("e6", EG, "Иванов Иван", None, None),
        # 2 holders, 1 share -> unhandled in the reference -> ''
        ("e7", EG, "Иванов Иван", 3, "1/3"),
        ("e7", EG, "Петров Пётр", None, None),
        # shared records with zero holders -> the bare type (:1237)
        ("e8", EG, None, 9, "1/9"),
    ]
    got = _run(spark, rights, _parcels([f"e{i}" for i in range(1, 9)]))
    assert got["e1"] == f"{EG}(10 долей; 3 правообладателей)"
    assert got["e2"] == f"{EG} ; 3 правообладателей)"
    assert got["e3"] == f"{EG}: 1/5 Иванов Иван, 4/5 Петров Пётр"
    assert got["e4"] == f"{EG}: Иванов Иван, Петров Пётр"
    assert got["e5"] == f"{EG}: 2/5 ООО Поле ИНН: 7709"
    assert got["e6"] == f"{EG}: Иванов Иван"
    assert got["e7"] == ""
    assert got["e8"] == EG
