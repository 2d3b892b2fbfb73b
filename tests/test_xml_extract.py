"""XML ingest parity: dispatch, projection, geometry assembly quirks, and
the distributed mapInPandas path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rosreestr_xml_to_gis_converter_spark.functions.geometry import (
    gauss_area,
    unpack_rings,
)
from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import (
    kvzu_xml,
    land_record_xml,
    unsupported_xml,
)
from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import (
    parse_extract,
    parse_extracts,
)

SQUARE_XY = np.array([[10.0, 20.0], [14.0, 20.0], [14.0, 24.0], [10.0, 24.0], [10.0, 20.0]])
HOLE_XY = np.array([[11.0, 21.0], [11.0, 23.0], [13.0, 23.0], [13.0, 21.0], [11.0, 21.0]])


def test_dispatch_and_projection_kvzu():
    rows = parse_extract("f1.xml", kvzu_xml("69:40:01:5", [SQUARE_XY]))
    assert len(rows) == 1
    r = rows[0]
    assert r["source_schema"] == "KVZU"
    assert r["cad_number"] == "69:40:01:5"
    assert r["area"] == "1000"
    assert r["category_code"] == "003001000000"
    assert r["date_reg"] == "17.05.2020"  # dd.mm.yyyy invert
    assert r["error"] is None


def test_dispatch_land_record():
    r = parse_extract("f2.xml", land_record_xml("50:11:003:12", [SQUARE_XY]))[0]
    assert r["source_schema"] == "land_record"
    assert r["cad_number"] == "50:11:003:12"
    assert r["date_reg"] == "03.11.2021"
    assert r["geom"] is not None


def test_unsupported_schema_goes_to_error_bucket():
    r = parse_extract("bad.xml", unsupported_xml())[0]
    assert r["source_schema"] is None
    assert r["error"] == "unsupported_schema"
    r2 = parse_extract("broken.xml", b"<notclosed")[0]
    assert r2["error"].startswith("parse_error")


def test_geometry_axis_swap_and_orientation():
    """EGRN Ordinate X=northing / Y=easting: the parser's [Y, X] swap
    (reference real_estate.py:746-748) yields conventional (x, y) rings;
    first ring positive gauss sign, hole negative (:764-780)."""
    r = parse_extract("g.xml", kvzu_xml("69:40:01:7", [SQUARE_XY, HOLE_XY]))[0]
    rings = unpack_rings(r["geom"])
    assert len(rings) == 2
    # stored pairs are (easting, northing) = the fixture's (x, y)
    xs = {p[0] for p in rings[0]}
    assert xs == {10.0, 14.0}
    assert gauss_area(rings[0]) > 0
    assert gauss_area(rings[1]) < 0


def test_last_writer_wins_across_entities():
    """A second EntitySpatial overwrites the first (real_estate.py:781-782)."""
    shifted = SQUARE_XY + 100.0
    r = parse_extract(
        "lww.xml", kvzu_xml("69:40:01:8", [SQUARE_XY], extra_entity=[shifted])
    )[0]
    rings = unpack_rings(r["geom"])
    assert len(rings) == 1
    assert {p[0] for p in rings[0]} == {110.0, 114.0}  # the LATER entity's xs


def test_open_tail_dropped():
    """Vertices after the last closure form no ring (reference iterates
    closures only, real_estate.py:764-780)."""
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import KVZU_NS

    # hand-built entity: labels 1,2,3,4 never repeat -> no closure
    units = "".join(
        f'<SpelementUnit SuNmb="{i + 1}"><Ordinate X="{x!r}" Y="{y!r}"/></SpelementUnit>'
        for i, (x, y) in enumerate(SQUARE_XY[:-1])
    )
    xml = f"""<?xml version="1.0"?><KVZU xmlns="{KVZU_NS}"><Parcels>
    <Parcel CadastralNumber="69:40:01:9"><EntitySpatial><SpatialElement>{units}
    </SpatialElement></EntitySpatial></Parcel></Parcels></KVZU>"""
    r = parse_extract("open.xml", xml)[0]
    assert r["geom"] is None


def test_distributed_parse_matches_local(spark):
    docs = {
        "a.xml": kvzu_xml("69:40:01:1", [SQUARE_XY]),
        "b.xml": land_record_xml("50:11:003:2", [SQUARE_XY, HOLE_XY]),
        "c.xml": unsupported_xml(),
    }
    files = spark.createDataFrame(
        pd.DataFrame(
            {"path": list(docs), "content": [v.encode() for v in docs.values()]}
        )
    )
    got = {r.doc_id: r.asDict() for r in parse_extracts(files).collect()}
    assert got["a.xml"]["cad_number"] == "69:40:01:1"
    assert got["b.xml"]["source_schema"] == "land_record"
    assert got["c.xml"]["error"] == "unsupported_schema"
    local = parse_extract("b.xml", docs["b.xml"])[0]
    assert bytes(got["b.xml"]["geom"]) == local["geom"]


def test_classifier_label_join_after_ingest(spark):
    """Code -> label broadcast join with '-' default (the reference's
    per-object dict lookups, real_estate.py:881-886)."""
    from pyspark.sql import functions as F

    files = spark.createDataFrame(
        pd.DataFrame(
            {
                "path": ["a.xml", "b.xml"],
                "content": [
                    kvzu_xml("1:1:1:1", [SQUARE_XY], category="003001000000").encode(),
                    kvzu_xml("1:1:1:2", [SQUARE_XY], category="999999999999").encode(),
                ],
            }
        )
    )
    parcels = parse_extracts(files)
    dim = spark.createDataFrame(
        [("003001000000", "Земли сельскохозяйственного назначения")],
        schema="code string, label string",
    )
    out = {
        r.cad_number: r.category
        for r in parcels.join(
            F.broadcast(dim), parcels.category_code == dim.code, "left"
        )
        .select("cad_number", F.coalesce("label", F.lit("-")).alias("category"))
        .collect()
    }
    assert out["1:1:1:1"].startswith("Земли")
    assert out["1:1:1:2"] == "-"


def test_composite_parcel_entry_explode(spark):
    """Composite land use (CompositionEZ) -> one row per entry parcel with
    the parent CN carried; simple parcels one row with '-'
    (real_estate.py:800-811, main.py:416-454)."""
    from rosreestr_xml_to_gis_converter_spark.pipeline import explode_entry_parcels

    files = spark.createDataFrame(
        pd.DataFrame(
            {
                "path": ["ez.xml", "plain.xml"],
                "content": [
                    kvzu_xml(
                        "69:40:0:1",
                        [SQUARE_XY],
                        entry_parcels=["69:40:1:1", "69:40:1:2", "69:40:1:3"],
                    ).encode(),
                    kvzu_xml("69:40:0:2", [SQUARE_XY]).encode(),
                ],
            }
        )
    )
    parcels = parse_extracts(files)
    rows = {
        (r.cad_number, r.parent_cad_number)
        for r in explode_entry_parcels(parcels).collect()
    }
    assert rows == {
        ("69:40:1:1", "69:40:0:1"),
        ("69:40:1:2", "69:40:0:1"),
        ("69:40:1:3", "69:40:0:1"),
        ("69:40:0:2", "-"),
    }


def test_zip_extraction_two_levels_and_sig_drop(spark):
    """S2: nested zips fan out to member files; .sig companions dropped
    (logic.py:83-93, main.py:149-175)."""
    import io
    import zipfile

    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import (
        extract_zip_contents,
    )

    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as z:
        z.writestr("deep.xml", kvzu_xml("1:1:1:3", [SQUARE_XY]))
        z.writestr("deep.sig", "signature")
    outer = io.BytesIO()
    with zipfile.ZipFile(outer, "w") as z:
        z.writestr("a.xml", kvzu_xml("1:1:1:1", [SQUARE_XY]))
        z.writestr("nested.zip", inner.getvalue())
    files = spark.createDataFrame(
        pd.DataFrame(
            {
                "path": ["batch.zip", "plain.xml"],
                "content": [
                    outer.getvalue(),
                    kvzu_xml("1:1:1:2", [SQUARE_XY]).encode(),
                ],
            }
        )
    )
    out = extract_zip_contents(files)
    names = sorted(r.path for r in out.collect())
    assert names == ["batch.zip!a.xml", "batch.zip!nested.zip!deep.xml", "plain.xml"]
    # composes with the parser
    got = {r.cad_number for r in parse_extracts(out).collect()}
    assert got == {"1:1:1:1", "1:1:1:2", "1:1:1:3"}


def test_dispatch_kpzu_and_build_record():
    """KPZU (single namespaced Parcel) and build_record (OCC family with
    '-'-stubbed land attributes, real_estate.py:1771-1787)."""
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import (
        build_record_xml,
        kpzu_xml,
    )

    r = parse_extract("k.xml", kpzu_xml("69:40:02:7", [SQUARE_XY]))[0]
    assert r["source_schema"] == "KPZU"
    assert r["cad_number"] == "69:40:02:7"
    assert r["area"] == "750"
    assert r["date_reg"] == "11.02.2019"
    assert r["geom"] is not None

    b = parse_extract("b.xml", build_record_xml("69:40:02:8:15", [SQUARE_XY]))[0]
    assert b["source_schema"] == "build_record"
    assert b["cad_number"] == "69:40:02:8:15"
    assert b["category_code"] == "-"  # OCC stub
    assert b["area"] == "450.7"
    assert b["geom"] is not None


def test_dispatch_occ_families_skip_orientation():
    """KVOKS/KPOKS: one ring per SpatialElement, NO orientation
    normalization (real_estate.py:1821-1835) — a CCW-input ring stays
    CCW, unlike the parcel families."""
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import KPOKS_NS
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvoks_xml

    ccw = SQUARE_XY  # engine-order CCW in (x, y)
    r = parse_extract("o.xml", kvoks_xml("69:40:03:77", [ccw]))[0]
    assert r["source_schema"] == "KVOKS"
    assert r["category_code"] == "-"
    rings = unpack_rings(r["geom"])
    # parcel families would force this positive; OCC must NOT
    kv = parse_extract("p.xml", kvzu_xml("69:40:03:78", [ccw]))[0]
    assert gauss_area(unpack_rings(kv["geom"])[0]) > 0
    assert gauss_area(rings[0]) < 0  # unnormalized

    k = parse_extract("q.xml", kvoks_xml("69:40:03:79", [ccw], ns=KPOKS_NS))[0]
    assert k["source_schema"] == "KPOKS"


def test_gkn_fallback_appends_on_modern_list_mismatch():
    """real_estate.py:282-287: the legacy GKN Rights block is read
    whenever cell_owner is EMPTY — which includes the case where modern
    rights exist but their type/owner lists MISMATCH — and its rows are
    APPENDED to the same lists with the `not in list_owner` owner dedup
    (:332,335,342).  Round 4 mirrors that (previously the fallback fired
    only when the modern block was empty)."""
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvzu_xml
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import parse_extract

    import numpy as np

    sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    xml = kvzu_xml(
        "69:5:5:5",
        [sq],
        rights=[
            {"code": "001005000000", "owner": "Иванов Иван"},
            {"code": "001005000000"},  # typed right with no Owner -> mismatch
        ],
    )
    gkn = (
        "<Rights>"
        "<Right><Type>001005000000</Type>"
        "<Owners><Owner><Person><FamilyName>Петров</FamilyName>"
        "<FirstName>Пётр</FirstName></Person></Owner></Owners>"
        "<Registration><RegNumber>77-77/001</RegNumber>"
        "<RegDate>2019-01-02</RegDate></Registration></Right>"
        "<Right><Type>001005000000</Type>"
        "<Owners><Owner><Person><FamilyName>Иванов</FamilyName>"
        "<FirstName>Иван</FirstName></Person></Owner></Owners>"
        "<Registration><RegNumber>77-77/002</RegNumber></Registration></Right>"
        "</Rights>"
    )
    xml = xml.replace("</Parcel>", gkn + "</Parcel>")
    row = parse_extract("gkn.xml", xml)[0]
    rights = row["rights"]
    assert [r["owner"] for r in rights] == ["Иванов Иван", None, "Петров Пётр", None]
    # the duplicate GKN owner ('Иванов Иван') is dropped by the dedup but
    # its right row (type + reg number) still lands
    assert rights[3]["reg_number"] == "77-77/002"
    assert all(r["rec_first"] for r in rights)
    # matched modern lists -> the GKN block is NOT read
    xml_ok = kvzu_xml(
        "69:5:5:6", [sq], rights=[{"code": "001005000000", "owner": "Иванов Иван"}]
    ).replace("</Parcel>", gkn + "</Parcel>")
    row_ok = parse_extract("ok.xml", xml_ok)[0]
    assert [r["owner"] for r in row_ok["rights"]] == ["Иванов Иван"]
