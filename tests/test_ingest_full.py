"""Round-2 ingest breadth: the full reference attribute set, structured
rights/encumbrances feeding the owner matrix, multi-contour geometry,
and the classifier finalization chains (VERDICT round 1, items 3-6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.classifiers import (
    ABBREVIATIONS,
    LAND_CATEGORY,
    REGION,
    RIGHT,
    STATUS,
)
from rosreestr_xml_to_gis_converter_spark.functions.geometry import (
    gauss_area,
    unpack_rings,
)
from rosreestr_xml_to_gis_converter_spark.operators.attrs import owner_summary
from rosreestr_xml_to_gis_converter_spark.pipeline import (
    contours_of,
    finalize_attributes,
    rights_table,
)
from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import (
    egrn_restrict_records,
    egrn_right_records,
    kvzu_xml,
    land_record_xml,
)
from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import (
    parse_extract,
    parse_extracts,
)

SQ = np.array([[10.0, 50.0], [14.0, 50.0], [14.0, 54.0], [10.0, 54.0], [10.0, 50.0]])


def _files(spark, docs):
    return spark.createDataFrame(
        [(n, bytearray(x.encode())) for n, x in docs], schema="path string, content binary"
    )


def test_kvzu_full_attribute_set():
    """Every reference output attribute lands (XLSX header main.py:283-299):
    status code, cost, special notes, extract date, DateCreatedDoc
    preference, permitted use ByDoc, inner cad numbers."""
    xml = kvzu_xml(
        "69:10:05:1",
        [SQ],
        area="4321",
        state="01",
        cadastral_cost="777000.25",
        special_note="особые отметки",
        utilization_by_doc="для огородничества",
        date_created="2020-05-17",
        date_created_doc="1999-12-31",
        inner_cad_numbers=["69:10:05:100", "69:10:05:101"],
    )
    r = parse_extract("full.xml", xml)[0]
    assert r["area"] == "4321"
    assert r["status_code"] == "01"
    assert r["cadastral_cost"] == "777000.25"
    assert r["special_notes"] == "особые отметки"
    assert r["extract_date"] == "15.06.2023"  # FootContent/ExtractDate raw
    assert r["date_reg"] == "31.12.1999"  # DateCreatedDoc preferred (:706-715)
    assert r["permitted_use_by_doc"] == "для огородничества"
    assert r["estate_objects"] == ["69:10:05:100", "69:10:05:101"]


def test_kvzu_area_is_area_area_not_value():
    """area reads Area/Area (real_estate.py:813-822) — an Area/Value-only
    document yields no area (ADVICE round 1, high)."""
    xml = kvzu_xml("69:10:05:2", [SQ]).replace(
        "<Area><Area>1000</Area></Area>", "<Area><Value>1000</Value></Area>"
    )
    assert parse_extract("v.xml", xml)[0]["area"] is None


def test_kvzu_geometry_in_entity_spatial_namespace():
    """Geometry elements are found in the entity-spatial namespace
    (real_estate.py:965-981); the synth fixtures now emit spa:-prefixed
    SpatialElement/SpelementUnit/Ordinate."""
    r = parse_extract("ns.xml", kvzu_xml("69:10:05:3", [SQ]))[0]
    assert r["geom"] is not None
    rings = unpack_rings(r["geom"])
    assert len(rings) == 1 and gauss_area(rings[0]) > 0


def test_kvzu_address_fallback_parts():
    """No Note -> Region/District parts captured raw for the downstream
    address build (real_estate.py:845-855)."""
    xml = kvzu_xml(
        "69:10:05:4", [SQ], address=None, region="69", district=("Калининский", "р-н")
    )
    r = parse_extract("af.xml", xml)[0]
    assert r["address_note"] is None
    assert r["region_code"] == "69"
    assert r["district_name"] == "Калининский"
    assert r["district_type"] == "р-н"


def test_kvzu_multi_contour_keys():
    """Contours container -> one geometry per 'parent(NumberRecord)' key
    (real_estate.py:939-951), not collapsed."""
    xml = kvzu_xml(
        "69:10:05:5", None, contour_rings={"1": [SQ], "2": [SQ + 100.0]}
    )
    r = parse_extract("mc.xml", xml)[0]
    keys = [c["geom_key"] for c in r["contours"]]
    assert keys == ["69:10:05:5(1)", "69:10:05:5(2)"]
    assert r["geom"] is None  # no parcel-level key


def test_entry_parcel_geometry_keys():
    """CompositionEZ -> geometry keyed by entry-parcel CN (:800-811)."""
    xml = kvzu_xml(
        "69:10:05:6",
        None,
        entry_rings={"69:10:05:61": [SQ], "69:10:05:62": [SQ + 50.0]},
    )
    r = parse_extract("ez.xml", xml)[0]
    assert sorted(c["geom_key"] for c in r["contours"]) == ["69:10:05:61", "69:10:05:62"]
    assert r["entry_parcels"] == ["69:10:05:61", "69:10:05:62"]


def test_land_record_multi_contour_three_rows(spark):
    """VERDICT item 5: a 3-contour land_record yields 3 contour rows via
    contours_of, keyed by each contour's cad_number (:1621-1635)."""
    xml = land_record_xml(
        "50:1:2:3",
        None,
        contours={
            "50:1:2:3(1)": [SQ],
            "50:1:2:3(2)": [SQ + 10.0],
            "50:1:2:3(3)": [SQ + 20.0],
        },
    )
    parcels = parse_extracts(_files(spark, [("t.xml", xml)]))
    ct = contours_of(parcels).collect()
    assert sorted(r.geom_key for r in ct) == ["50:1:2:3(1)", "50:1:2:3(2)", "50:1:2:3(3)"]
    assert all(r.parent_cad_number == "50:1:2:3" for r in ct)
    assert all(r.geom is not None for r in ct)


def test_land_record_entry_parcels_from_special_notes():
    """Entry CNs parsed out of special_notes by regex when cad_links is
    absent (real_estate.py:1600-1607)."""
    notes = (
        "Кадастровые номера обособленных (условных) участков, входящих в "
        "единое землепользование: 50:1:2:31, 50:1:2:32"
    )
    xml = land_record_xml("50:1:2:30", [SQ], special_notes=notes)
    r = parse_extract("sn.xml", xml)[0]
    assert r["entry_parcels"] == ["50:1:2:31", "50:1:2:32"]


def test_rights_to_owner_summary_end_to_end(spark):
    """VERDICT item 4: XML rights records -> rights_table -> the A1 owner
    matrix; shared / joint / no-rights fixtures produce the reference's
    owner strings (real_estate.py:183-452, :363-380)."""
    shared = kvzu_xml(
        "69:1:1:1",
        [SQ],
        rights=[
            {"code": "001002000000", "owner": "ИВАНОВ ИВАН ИВАНОВИЧ", "share": ("1", "4")},
            {"code": "001002000000", "owner": "ПЕТРОВ ПЕТР ПЕТРОВИЧ", "share": ("3", "4")},
        ],
    )
    egrn_joint = land_record_xml(
        "50:2:2:2",
        [SQ],
        right_records=egrn_right_records(
            [
                {
                    "type": "Совместная собственность",
                    "holders": [
                        ("individual", "Сидорова Анна Петровна"),
                        ("individual", "Сидоров Борис Иванович"),
                    ],
                }
            ]
        ),
    )
    forest = kvzu_xml("69:3:3:3", [SQ], category="003005000000")  # лесной фонд
    docs = [("sh.xml", shared), ("jt.xml", egrn_joint), ("fo.xml", forest)]
    parcels = finalize_attributes(parse_extracts(_files(spark, docs)))
    rt = rights_table(parcels)
    out = {
        r.doc_id: r.owner
        for r in owner_summary(
            rt, parcels.select("doc_id", "category", "district_name")
        ).collect()
    }
    # 2 owner rows with 2 numeric shares -> the reference's B3e form
    # 'type: d1 N1, d2 N2' (real_estate.py:418-420)
    assert out["sh.xml"] == (
        "Долевая собственность: 1/4 Иванов Иван Иванович, 3/4 Петров Петр Петрович"
    )
    # jt.xml is a land_record -> the EGRN owner tree applies: one record
    # with a type vs two holders is a length mismatch, so the concat cell
    # 'last_type h1, h2' fires with holders in DOCUMENT order
    # (real_estate.py:1215-1218)
    assert out["jt.xml"] == "Совместная собственность Сидорова Анна Петровна, Сидоров Борис Иванович"
    assert out["fo.xml"] == "Собственность РФ"  # no rights + forest fund


def test_finalize_attributes_classifier_chains(spark):
    """J1 with the real shipped dimensions: status code -> label,
    category default 003008000000, permitted-use code fallback, address
    built from region classifier when Note is absent (:824-858)."""
    no_cat = kvzu_xml(
        "69:4:4:4",
        [SQ],
        state="06",
        address=None,
        region="69",
        district=("Калининский", "р-н"),
        utilization_by_doc=None,
        utilization_code="141004000000",
    ).replace("<Category>003001000000</Category>", "")
    parcels = finalize_attributes(parse_extracts(_files(spark, [("nc.xml", no_cat)])))
    row = parcels.collect()[0]
    assert row.status == STATUS["06"]
    assert row.category == LAND_CATEGORY["003008000000"]  # default code (:885)
    assert row.permitted_use == "Для ведения гражданами садоводства и огородничества"
    assert row.address == REGION["69"] + ", Калининский р-н"


def test_egrn_rights_and_restrictions_structured():
    rr = egrn_right_records(
        [
            {
                "type": RIGHT["001002000000"] if False else "Общая долевая собственность",
                "share": ("2", "5"),
                "holders": [("legal", "ООО Поле", "7709")],
                "number": "77-77/009",
                "date": "2019-03-04T00:00:00",
            }
        ]
    )
    enc = egrn_restrict_records(
        [
            {
                "type": "Ипотека",
                "number": "77:ИП",
                "date": "2020-02-02T00:00:00",
                "period": ("2020-02-02", "2040-02-02"),
                "holders": [("individual", "Кузнецов Олег Ильич")],
            }
        ]
    )
    xml = land_record_xml("50:5:5:5", [SQ], right_records=rr, restrict_records=enc)
    r = parse_extract("er.xml", xml)[0]
    ri = r["rights"][0]
    assert ri["right_type"] == "Общая долевая собственность"
    assert (ri["share_num"], ri["share_den"]) == ("2", "5")
    assert ri["owner"] == "ООО Поле ИНН: 7709"
    assert ri["reg_number"] == "77-77/009"
    e = r["encumbrances"][0]
    assert e["enc_name"] == "Ипотека"
    assert e["holder"] == "Кузнецов Олег Ильич"
    assert e["term"] == "срок действия: с 2020-02-02 по 2040-02-02"
    assert e["reg_date"] == "2020-02-02"


def test_abbreviation_chain_full_rules(spark):
    """F2 with the full 85-rule replace chain shipped as data
    (logic.py:50-68; rule order preserved)."""
    from rosreestr_xml_to_gis_converter_spark.functions.text import (
        apply_abbreviations,
    )

    assert len(ABBREVIATIONS) == 85
    df = spark.createDataFrame(
        [("земли сельскохозяйственного назначения",)], schema="s string"
    )
    out = df.select(
        apply_abbreviations(F.col("s"), ABBREVIATIONS).alias("s")
    ).first()["s"]
    assert out == "земли с/х назначения"


def test_multi_entity_accumulated_quirk():
    """Reference quirk (real_estate.py:735-782): with two EntitySpatial,
    vertex positions accumulate, only the LAST entity's ring spans
    survive, and its first ring lands as span key>0 -> forced negative
    (hole orientation).  ADVICE round 1, low."""
    shifted = SQ + 100.0
    r = parse_extract("q.xml", kvzu_xml("69:6:6:6", [SQ], extra_entity=[shifted]))[0]
    rings = unpack_rings(r["geom"])
    assert len(rings) == 1
    assert {p[0] for p in rings[0]} == {110.0, 114.0}  # later entity's points
    assert gauss_area(rings[0]) < 0  # span key > 0 -> hole orientation


def test_occ_address_fragments_long_tail(spark):
    """OCC address fallback long tail (real_estate.py:1721-1753): ordered
    District/City/Street/Level fragments captured and concatenated after
    the region classifier label in finalize_attributes."""
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvoks_xml

    xml = kvoks_xml("69:40:X:1", [SQ], address="x")
    xml = xml.replace(
        "<adrs:Note>x</adrs:Note>",
        '<adrs:Region>69</adrs:Region>'
        '<adrs:District Name="Калининский" Type="р-н"/>'
        '<adrs:City Type="г" Name="Тверь"/>'
        '<adrs:Street Name="Советская" Type="ул"/>'
        '<adrs:Level1 Type="д" Value="5"/>',
    )
    files = _files(spark, [("o.xml", xml)])
    row = finalize_attributes(parse_extracts(files)).select("address").first()
    assert row.address == (
        REGION["69"] + ", Калининский р-н, г Тверь, Советская ул, д 5"
    )


def test_rename_plan_collision_suffixes(spark):
    """EP2 rename (main.py:177-225): '{cad :->-}---{date .->-}.xml' with
    ' (2)'..' (n)' collision suffixes; unsupported docs get no name."""
    from rosreestr_xml_to_gis_converter_spark.pipeline import rename_plan
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import unsupported_xml

    docs = [
        (f"f{i}.xml", kvzu_xml("69:1:1:7" if i < 3 else f"69:1:1:{i}", [SQ]))
        for i in range(5)
    ]
    docs.append(("bad.xml", unsupported_xml()))
    out = {
        r.path: r.new_name
        for r in rename_plan(parse_extracts(_files(spark, docs)), "doc_id").collect()
    }
    assert out["f0.xml"] == "69-1-1-7---15-06-2023.xml"
    assert out["f1.xml"] == "69-1-1-7---15-06-2023 (2).xml"
    assert out["f2.xml"] == "69-1-1-7---15-06-2023 (3).xml"
    assert out["f3.xml"] == "69-1-1-3---15-06-2023.xml"
    assert out["bad.xml"] is None


def test_malformed_coordinates_quarantined_not_fatal(spark):
    """A document with unparseable coordinate text costs one error row,
    never a task failure (the reference's per-file log-and-continue,
    main.py:33-49)."""
    bad = kvzu_xml("69:9:9:9", [SQ]).replace('X="50.0"', 'X="not-a-number"', 1)
    good = kvzu_xml("69:9:9:8", [SQ])
    out = parse_extracts(
        _files(spark, [("bad.xml", bad), ("good.xml", good)])
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id["bad.xml"].error.startswith("ValueError")
    assert by_id["good.xml"].error is None and by_id["good.xml"].geom is not None


def test_egrn_plain_y_tag(spark):
    """EGRN ordinate fallback: <_y> preferred, plain <y> accepted
    (real_estate.py:1528-1533)."""
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import (
        _egrn_spatial_xml,
    )

    inner = _egrn_spatial_xml([SQ], y_tag="y")
    xml = land_record_xml("50:8:8:8", [SQ]).replace(
        _egrn_spatial_xml([SQ]), inner
    )
    r = parse_extract("y.xml", xml)[0]
    assert r["geom"] is not None
    rings = unpack_rings(r["geom"])
    assert {p[0] for p in rings[0]} == {10.0, 14.0}


def test_rights_strings_family_aware(spark):
    """Round 4: the I/K string columns follow the per-family reference
    builders.  KVZU I = modern Registration/Name texts only (doc order,
    duplicates kept, NO synthesized entries, real_estate.py:453-470),
    with the GKN branches only when that list is empty (:471-491, incl.
    the 'name; number' semicolon quirk); KVZU K emits entries only for
    Duration-bearing encumbrances (term '' when the element is empty,
    :649-661) with the GKN 'label №num от date' fallback; EGRN I/K use
    the always-three-parts / all-four-parts forms with '-' defaults
    (:1242-1270, :1402-1449)."""
    from rosreestr_xml_to_gis_converter_spark.operators.attrs import (
        with_rights_strings,
    )
    from rosreestr_xml_to_gis_converter_spark.pipeline import finalize_attributes
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import (
        egrn_restrict_records,
        egrn_right_records,
        kvzu_xml,
        land_record_xml,
    )
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import (
        parse_extracts,
    )

    # KVZU: two named rights (one name repeated) + a nameless one -> the
    # repeated name appears TWICE and the nameless right adds nothing
    named = kvzu_xml(
        "69:9:1:1",
        [SQ],
        rights=[
            {"code": "001001000000", "owner": "Иванов", "reg_name": "Собственность №1 от 2020"},
            {"code": "001001000000", "owner": "Петров", "reg_name": "Собственность №1 от 2020"},
            {"code": "001001000000", "owner": "Сидоров"},
        ],
        encumbrances=[
            {"name": "Аренда", "owner": "ООО Поле", "docs": ["д1", "д2"],
             "term": "49 лет"},
            {"name": "Сервитут", "owner": "ООО Газ", "empty_duration": True},
            {"name": "Запрет", "owner": "УФССП"},  # no Duration -> no K entry
        ],
    )
    # KVZU with NO modern rights but a legacy GKN block -> I falls back
    # to the GKN branches
    gkn = (
        "<Rights>"
        "<Right><Type>001001000000</Type>"
        "<Registration><RegNumber>77-01</RegNumber><RegDate>2019-01-02</RegDate>"
        "</Registration></Right>"
        "<Right><Name>Аренда земли</Name>"
        "<Registration><RegNumber>77-02</RegNumber></Registration></Right>"
        "<Right><Name>Только имя</Name></Right>"
        "</Rights>"
    )
    gkn_doc = kvzu_xml("69:9:1:2", [SQ]).replace("</Parcel>", gkn + "</Parcel>")
    # EGRN: records with full and partial I parts; restriction with all
    # K parts
    eg = land_record_xml(
        "50:9:1:3",
        [SQ],
        right_records=egrn_right_records(
            [
                {"type": "Собственность", "number": "50-11", "date": "2021-03-04",
                 "holders": [("individual", "Иванов Иван")]},
                {"type": "Аренда", "holders": [("individual", "Петров Пётр")]},
            ]
        ),
        restrict_records=egrn_restrict_records(
            [
                {"type": "Аренда", "number": "50-r1", "date": "2021-05-06",
                 "period": ("2021-05-06", "2070-05-06"),
                 "holders": [("individual", "Пётр Арендатор")]},
            ]
        ),
    )
    docs = [("n.xml", named), ("g.xml", gkn_doc), ("e.xml", eg)]
    p = with_rights_strings(finalize_attributes(parse_extracts(_files(spark, docs))))
    got = {
        r.doc_id: (r.own_name_reg_numb_date, r.enc_name_reg_numb_date_duration)
        for r in p.collect()
    }
    assert got["n.xml"][0] == "Собственность №1 от 2020; Собственность №1 от 2020"
    assert got["n.xml"][1] == "д1, д2, срок действия: 49 лет; , срок действия: "
    assert got["g.xml"][0] == (
        "Собственность №77-01 от 2019-01-02; Аренда земли; 77-02; Только имя"
    )
    i_e, k_e = got["e.xml"]
    assert i_e == "Собственность №50-11 от 2021-03-04; Аренда № от "
    assert "Аренда №50-r1 от 2021-05-06, " in k_e


def test_encumbrances_str_kvzu_faithful(spark):
    """Round 4: the J column follows real_estate.py:498-625 — owner-ful
    entries carry the '(sharetext)' suffix but dedup on a key WITHOUT it;
    owner-less entries join as a set ('; ', sorted stand-in) and the
    RightClaim text appends; the normalization pass keeps quoted entries
    verbatim, title-cases the tail of long ones, and DROPS entries
    shorter than four words; the legacy GKN block is the fallback when no
    modern owner-ful entries exist."""
    from rosreestr_xml_to_gis_converter_spark.operators.attrs import (
        with_rights_strings,
    )
    from rosreestr_xml_to_gis_converter_spark.pipeline import finalize_attributes
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvzu_xml
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import (
        parse_extracts,
    )

    full = kvzu_xml(
        "69:8:1:1",
        [SQ],
        encumbrances=[
            {"name": "Аренда", "owner": "иванов иван иванович", "kind": "person",
             "share_text": "1/2"},
            # same dedup key (suffix excluded) -> dropped
            {"name": "Аренда", "owner": "иванов иван иванович", "kind": "person"},
            {"name": "Аренда", "owner": 'ООО "Ромашка"', "kind": "org"},
            {"name": "Сервитут"},               # owner-less -> set
            {"name": "Арест", "share_text": "3/4"},  # owner-less + suffix
            {"name": "Запрет", "owner": "УФССП", "kind": "org"},  # 2 words -> dropped
        ],
        right_claim="есть притязания",
    )
    gkn_enc = (
        "<Encumbrances>"
        "<Encumbrance><Type>022002000000</Type>"
        "<OwnersRestrictionInFavorem><OwnerRestrictionInFavorem>"
        "<Organization><Name>Банк Кредит</Name></Organization>"
        "</OwnerRestrictionInFavorem></OwnersRestrictionInFavorem>"
        "</Encumbrance>"
        "<Encumbrance><Type>022002000000</Type>"
        "<OwnersRestrictionInFavorem><OwnerRestrictionInFavorem>"
        "<Organization><Name>Банк кредитного взаимодействия</Name></Organization>"
        "</OwnerRestrictionInFavorem></OwnersRestrictionInFavorem>"
        "</Encumbrance>"
        "<Encumbrance><Type>022001000000</Type></Encumbrance>"
        "</Encumbrances>"
    )
    gkn_doc = kvzu_xml("69:8:1:2", [SQ]).replace("</Parcel>", gkn_enc + "</Parcel>")
    docs = [("f.xml", full), ("g.xml", gkn_doc)]
    p = with_rights_strings(finalize_attributes(parse_extracts(_files(spark, docs))))
    got = {r.doc_id: r.encumbrances_str for r in p.collect()}
    assert got["f.xml"] == (
        'Аренда иванов иван Иванович  (1/2), Аренда ООО "Ромашка"; '
        "Арест (3/4); Сервитут, есть притязания"
    )
    # GKN fallback: label + org name.  'Арест Банк Кредит' is only 3
    # words -> the reference's normalization pass DROPS it (:607-617),
    # as it does the bare-label 'Сервитут'; the 4-word entry survives,
    # title-cased
    assert got["g.xml"] == "Арест Банк Кредитного Взаимодействия"
