"""EGRN-extract XML ingest: build the parcel layer from Rosreestr-style
cadastral extracts, distributed.

Reference behavior re-expressed Spark-first (NOT a port):

* schema dispatch by sniffing the root's children — the 6-way dispatch at
  /root/reference/real_estate.py:39-66; unknown roots go to the error
  bucket instead of being silently skipped (main.py:350-352);
* the full attribute set of the reference's output row (XLSX header
  main.py:283-299 / SHP fields main.py:325-342): cad_number, area,
  status, category, permitted use, address (+fallback parts),
  district, cadastral cost, special notes, extract date, registration
  date, entry parcels, estate objects;
* geometry elements are searched in the ENTITY-SPATIAL namespace
  (urn://...entity-spatial/5.0.1 — real_estate.py:965-981, 1825-1833)
  with a document-namespace fallback; addresses in the ADDRESS-OUTPUT
  namespace (real_estate.py:824-858);
* rights and encumbrance records are parsed into structured arrays
  (real_estate.py:183-452 owner / :453-682 encumbrance / :1076-1239 and
  :1272-1455 EGRN variants); the declarative owner matrix
  (operators/attrs.py) consumes the exploded rows;
* multi-contour parcels emit one contour per key — entry-parcel CN
  (real_estate.py:800-811), 'parent(NumberRecord)' (:939-951), or
  cad_number/number_pp/parent (:1621-1635) — with last-writer-wins
  within a key (:781-782, :1834-1835), NOT collapsed to one geometry;
* classifier code columns stay codes here; label resolution happens
  downstream as broadcast joins (the reference re-reads 6 CSVs per
  object, real_estate.py:32-37 — the engine loads each dimension once).

Execution shape: files land as (path, content) rows (``binaryFile``
source or a listing), parsing runs in ``mapInPandas`` batches — one
Python stage, Arrow in/out, no driver loop — so a 10^8-file ingest
distributes like any other scan.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from rosreestr_xml_to_gis_converter_spark.functions.geometry import pack_rings

KVZU_NS = "urn://x-artefacts-rosreestr-ru/outgoing/kvzu/7.0.1"
KPZU_NS = "urn://x-artefacts-rosreestr-ru/outgoing/kpzu/6.0.1"
KVOKS_NS = "urn://x-artefacts-rosreestr-ru/outgoing/kvoks/3.0.1"
KPOKS_NS = "urn://x-artefacts-rosreestr-ru/outgoing/kpoks/4.0.1"
# common complex-type namespaces (real_estate.py:965-981)
SPA_NS = "urn://x-artefacts-rosreestr-ru/commons/complex-types/entity-spatial/5.0.1"
ADR_NS = "urn://x-artefacts-rosreestr-ru/commons/complex-types/address-output/4.0.1"
PARAM_NS = "urn://x-artefacts-rosreestr-ru/commons/complex-types/parameters-oks/2.0.1"

RIGHT_STRUCT = (
    "struct<right_code:string,right_type:string,owner:string,share_num:string,"
    "share_den:string,share_text:string,reg_name:string,reg_number:string,"
    "reg_date:string,rec_first:boolean,gkn:boolean>"
)
ENC_STRUCT = (
    "struct<enc_code:string,enc_name:string,holder:string,share_text:string,"
    "docs:array<string>,term:string,reg_number:string,reg_date:string>"
)
CONTOUR_STRUCT = "struct<geom_key:string,geom:binary>"

PARCEL_ROW_SCHEMA = (
    "doc_id string, source_schema string, obj_type string, "
    "cad_number string, area string, status_code string, status string, "
    "category_code string, permitted_use_by_doc string, permitted_use_code string, "
    "address_note string, region_code string, district_name string, "
    "district_type string, locality_name string, locality_type string, "
    "address_parts array<string>, "
    "cadastral_cost string, special_notes string, extract_date string, "
    "date_reg string, entry_parcels array<string>, estate_objects array<string>, "
    f"rights array<{RIGHT_STRUCT}>, encumbrances array<{ENC_STRUCT}>, "
    f"contours array<{CONTOUR_STRUCT}>, geom binary, right_claim string, error string"
)

_COLS = [f.split(" ")[0] for f in re.sub(r"<[^<>]*>", "", re.sub(r"<[^<>]*>", "", PARCEL_ROW_SCHEMA)).split(", ")]

TYPE_PARCEL = "Земельный участок"
TYPE_OCC = "Объект капитального строительства"


def _gauss_area(pts: list[list[float]]) -> float:
    """Shoelace sign (logic.py:71-80): positive = counter-clockwise."""
    one = sum(pts[i][0] * pts[i + 1][1] for i in range(len(pts) - 1))
    two = sum(pts[i][1] * pts[i + 1][0] for i in range(len(pts) - 1))
    return (two - one) / 2


def _spans_to_rings(spans: dict[int, int], pts: list[list[float]]) -> list[np.ndarray]:
    """Ring spans ({start_pos: end_pos}, 1-based into the accumulated
    point stream) -> oriented rings: the span keyed 0 is the outer ring
    (forced positive-signed), every other span is a hole (forced
    negative) — real_estate.py:764-780."""
    rings: list[np.ndarray] = []
    for key, end in spans.items():
        if key > 0:
            poly = [pts[i - 1] for i in range(key, end)]
            if len(poly) == 0:
                continue
            if _gauss_area(poly) > 0:
                poly = poly[::-1]
        else:
            poly = [pts[i - 1] for i in range(key + 1, end)]
            if len(poly) == 0:
                continue
            if not (_gauss_area(poly) > 0):
                poly = poly[::-1]
        rings.append(np.asarray(poly, dtype=np.float64))
    return rings


def _findall_any(el: ET.Element, tag: str, spa: str, ns: str) -> list[ET.Element]:
    """Entity-spatial namespace first (real_estate.py:965-981), then the
    document namespace, then bare (defensive fallback for older layouts)."""
    return el.findall(f"{spa}{tag}") or el.findall(f"{ns}{tag}") or el.findall(tag)


def _find_any(el: ET.Element, tag: str, spa: str, ns: str) -> ET.Element | None:
    for prefix in (spa, ns, ""):
        found = el.find(f"{prefix}{tag}")
        if found is not None:
            return found
    return None


def _kvzu_container_rings(container: ET.Element, ns: str, spa: str) -> bytes | None:
    """All EntitySpatial of one geometry container -> packed rings.

    Faithful to real_estate.py:735-782: the point stream and seen-label
    set accumulate ACROSS EntitySpatial elements, ring spans are
    detected per entity, and the LAST entity with any detected span wins
    (``result.update`` per entity inside the loop) — so with multiple
    spatial entities the later entity's rings reference positions in the
    accumulated stream and earlier entities' spans are discarded.
    """
    pts: list[list[float]] = []
    seen: list[str] = []
    pos_next = 0
    final_spans: dict[int, int] | None = None
    for entity in container.findall(f"{ns}EntitySpatial"):
        spans: dict[int, int] = {}
        spatial_elements = _findall_any(entity, "SpatialElement", spa, ns)
        for spel in spatial_elements:
            units = _findall_any(spel, "SpelementUnit", spa, ns)
            for unit in units:
                ordinate = _find_any(unit, "Ordinate", spa, ns)
                if ordinate is None:
                    continue
                # axis swap (real_estate.py:746-748): Ordinate X is the
                # NORTHING and Y the EASTING -> conventional [Y, X]
                pts.append([float(ordinate.get("Y")), float(ordinate.get("X"))])
                su = unit.get("SuNmb")
                if su not in seen:
                    seen.append(su)
                else:
                    position = int(pos_next)
                    pos_next = len(pts) + 1
                    spans[position] = pos_next
                    seen.append(su)
        if spans:
            final_spans = spans
    if not final_spans:
        return None
    rings = _spans_to_rings(final_spans, pts)
    return pack_rings(rings) if rings else None


def _egrn_container_rings(contour: ET.Element) -> bytes | None:
    """EGRN contour -> packed rings (real_estate.py:1509-1559): points
    and repeat keys (coord-pair TEXT, not vertex labels) accumulate
    across all entity_spatial of the contour; rings built once from the
    accumulated spans."""
    pts: list[list[float]] = []
    seen: list[str] = []
    spans: dict[int, int] = {}
    pos_next = 0
    for entity in contour.findall("entity_spatial"):
        spatials = entity.find("spatials_elements")
        if spatials is None:
            continue
        for spel in spatials.findall("spatial_element"):
            ordinates = spel.find("ordinates")
            if ordinates is None:
                continue
            for o in ordinates.findall("ordinate"):
                x_el = o.find("x")
                y_el = o.find("_y")
                if y_el is None:
                    y_el = o.find("y")
                if x_el is None or y_el is None:
                    continue
                pts.append([float(y_el.text), float(x_el.text)])
                key = x_el.text + y_el.text
                if key not in seen:
                    seen.append(key)
                else:
                    position = int(pos_next)
                    pos_next = len(pts) + 1
                    spans[position] = pos_next
                    seen.append(key)
    if not pts or not spans:
        return None
    rings = _spans_to_rings(spans, pts)
    return pack_rings(rings) if rings else None


def _occ_container_rings(container: ET.Element, ns: str, spa: str) -> bytes | None:
    """OCC geometry (real_estate.py:1821-1835): one ring per
    SpatialElement, axis swap only — orientation normalization is
    deliberately SKIPPED; last EntitySpatial with coordinates wins."""
    packed = None
    for entity in container.findall(f"{ns}EntitySpatial"):
        rings: list[np.ndarray] = []
        for spel in _findall_any(entity, "SpatialElement", spa, ns):
            ring = []
            for unit in _findall_any(spel, "SpelementUnit", spa, ns):
                ordinate = _find_any(unit, "Ordinate", spa, ns)
                if ordinate is not None:
                    ring.append([float(ordinate.get("Y")), float(ordinate.get("X"))])
            if ring:
                rings.append(np.asarray(ring, dtype=np.float64))
        if rings:
            packed = pack_rings(rings)
    return packed


def _contours_dict_to_rows(result: dict[str, bytes]) -> list[dict]:
    return [{"geom_key": k, "geom": v} for k, v in result.items()]


# --- shared text helpers -----------------------------------------------------


def _invert_date(iso: str | None) -> str | None:
    """ISO yyyy-mm-dd -> dd.mm.yyyy via split/reverse
    (real_estate.py:712-715, :1451-1461)."""
    if not iso:
        return None
    return ".".join(reversed(iso.split("T")[0][:10].split("-")))


def _txt(el: ET.Element | None) -> str | None:
    return el.text if el is not None else None


def _inn_rewrite(name: str | None) -> str | None:
    """', ИНН' -> ' ИНН' (real_estate.py:243,265,544)."""
    if name is None:
        return None
    return re.sub(", ИНН", " ИНН", name)


# --- KVZU-family rights / encumbrances (real_estate.py:183-682) --------------


def _kvzu_owner_name(owner_el: ET.Element, ns: str) -> list[str]:
    """Owner -> names: Person/Content, Organization/Content (ИНН
    rewrite), Governance/Name (real_estate.py:252-276)."""
    names = []
    for child in owner_el:
        if child.tag == f"{ns}Person":
            names.append(_txt(child.find(f"{ns}Content")))
        elif child.tag == f"{ns}Organization":
            names.append(_inn_rewrite(_txt(child.find(f"{ns}Content"))))
        elif child.tag == f"{ns}Governance":
            names.append(_txt(child.find(f"{ns}Name")))
    return [n for n in names if n is not None]


def _parse_share_text(text: str | None) -> tuple[str | None, str | None]:
    """ShareText '3/25' -> (num, den); 'пропорциональн...' and hectare
    shares stay text-only.  Mirrors the reference's denominator
    extraction exactly (real_estate.py:215):
    ``int(re.sub(r"[0-9]+/", '', text))`` — every 'digits/' prefix is
    stripped and the remainder must parse as an int ('2' alone is a
    valid numeric share of denominator 2; '10 га' raises -> hectare)."""
    if text is None or re.search(r"пропорциональн", text):
        return None, None
    rest = re.sub(r"[0-9]+/", "", text)
    try:
        den = int(rest)
    except ValueError:
        return None, None
    m = re.match(r"\s*(\d+)\s*/", text)
    return (m.group(1) if m else None), str(den)


def _kvzu_rights(extract_object_right: ET.Element | None, fallback_container: ET.Element | None, ns: str) -> list[dict]:
    """Right records -> structured rows.  Primary: ExtractObject/
    ObjectRight/Right (real_estate.py:201-276); fallback: the legacy GKN
    ``Rights`` block (:287-345) used only when the primary is empty."""
    rows: list[dict] = []
    if extract_object_right is not None:
        for right in extract_object_right.findall(
            f"{ns}ExtractObject/{ns}ObjectRight/{ns}Right"
        ):
            reg = right.find(f"{ns}Registration")
            code = None
            share_num = share_den = share_text = None
            reg_name = None
            if reg is not None:
                code = _txt(reg.find(f"{ns}Type"))
                reg_name = _txt(reg.find(f"{ns}Name"))
                if code == "001002000000":  # shared ownership
                    st = reg.find(f"{ns}ShareText")
                    sh = reg.find(f"{ns}Share")
                    if st is not None:
                        share_text = st.text
                        share_num, share_den = _parse_share_text(st.text)
                    elif sh is not None:
                        share_num = sh.get("Numerator")
                        share_den = sh.get("Denominator")
                        share_text = f"{share_num}/{share_den}"
            owner_el = right.find(f"{ns}Owner")
            names = _kvzu_owner_name(owner_el, ns) if owner_el is not None else []
            if not names:
                if code is None and reg_name is None:
                    continue  # Right with only Encumbrance children (:498)
                names = [None]
            for k, name in enumerate(names):
                rows.append(
                    {
                        "right_code": code,
                        "right_type": None,  # classifier join downstream
                        "owner": name,
                        "share_num": share_num,
                        "share_den": share_den,
                        "share_text": share_text,
                        "reg_name": reg_name,
                        "reg_number": None,
                        "reg_date": None,
                        "rec_first": k == 0,  # shares/types count per RIGHT
                        "gkn": False,
                    }
                )
    # legacy GKN fallback (real_estate.py:282-345): the reference reads
    # the GKN block whenever cell_owner is EMPTY — i.e. when the modern
    # lists mismatch (len(list_type_sobstv) != len(list_owner)) OR both
    # are empty — and APPENDS the GKN rows to the same lists (with the
    # `not in list_owner` owner dedup).  Mirror that exactly: count the
    # modern non-joint types (per record) and owners (per row) and fall
    # through on mismatch, extending rather than replacing.
    n_types = sum(
        1
        for r in rows
        if r["rec_first"] and r["right_code"] is not None and r["right_code"] != "001003000000"
    )
    modern_owners = [
        r["owner"]
        for r in rows
        if r["owner"] is not None
        and r["right_code"] is not None
        and r["right_code"] != "001003000000"
    ]
    if n_types == 0 or n_types != len(modern_owners):
        seen_owners = list(modern_owners)
        rights_gkn = (
            fallback_container.find(f"{ns}Rights") if fallback_container is not None else None
        )
        if rights_gkn is not None:
            for right in rights_gkn.findall(f"{ns}Right"):
                code = _txt(right.find(f"{ns}Type"))
                share_num = share_den = share_text = None
                sh = right.find(f"{ns}Share")
                if sh is not None:
                    share_num = sh.get("Numerator")
                    share_den = sh.get("Denominator")
                    share_text = f"{share_num}/{share_den}"
                name = None
                person = right.find(f"{ns}Owners/{ns}Owner/{ns}Person")
                org = right.find(f"{ns}Owners/{ns}Owner/{ns}Organization")
                gov = right.find(f"{ns}Owners/{ns}Owner/{ns}Governance")
                blank_placeholder = False
                if person is not None:
                    parts = [
                        _txt(person.find(f"{ns}FamilyName")),
                        _txt(person.find(f"{ns}FirstName")),
                        _txt(person.find(f"{ns}Patronymic")),
                    ]
                    name = " ".join(p for p in parts if p) or None
                elif org is not None:
                    # blank Organization/Governance names append ' '
                    # (real_estate.py:336-345)
                    name = _txt(org.find(f"{ns}Name"))
                    blank_placeholder = name is None
                    name = name or " "
                elif gov is not None:
                    name = _txt(gov.find(f"{ns}Name"))
                    blank_placeholder = name is None
                    name = name or " "
                if name is not None:
                    # The reference's dedup tests the RAW text against
                    # list_owner (:330,337 `names_gkn.text not in
                    # list_owner`) — None never matches, so a blank name
                    # appends its ' ' placeholder unconditionally, once
                    # per blank right (two blank GKN org names -> two
                    # ' ' entries).  Only non-blank names dedup.
                    if not blank_placeholder and name in seen_owners:
                        # the reference's `not in list_owner` dedup
                        # (:327,330,337): the duplicate owner is skipped,
                        # the right/type row still counts
                        name = None
                    else:
                        seen_owners.append(name)
                rows.append(
                    {
                        "right_code": code,
                        "right_type": None,
                        "owner": name,
                        "share_num": share_num,
                        "share_den": share_den,
                        "share_text": share_text,
                        # GKN rights may carry their own Name element —
                        # the I-column's 'name; number' branch reads it
                        # (real_estate.py:485-491)
                        "reg_name": _txt(right.find(f"{ns}Name")),
                        "reg_number": _txt(right.find(f"{ns}Registration/{ns}RegNumber")),
                        "reg_date": _txt(right.find(f"{ns}Registration/{ns}RegDate")),
                        "rec_first": True,  # one row per GKN right
                        "gkn": True,
                    }
                )
    return rows


def _kvzu_encumbrances(extract_object_right: ET.Element | None, fallback_container: ET.Element | None, ns: str) -> list[dict]:
    """Encumbrance blocks -> structured rows (real_estate.py:498-619);
    legacy GKN ``Encumbrances`` fallback (:575-610)."""
    rows: list[dict] = []
    if extract_object_right is not None:
        for right in extract_object_right.findall(
            f"{ns}ExtractObject/{ns}ObjectRight/{ns}Right"
        ):
            for enc in right.findall(f"{ns}Encumbrance"):
                name = _txt(enc.find(f"{ns}Name"))
                share_text = _txt(enc.find(f"{ns}ShareText"))
                docs = []
                for df in enc.findall(f"{ns}DocFound"):
                    content = _txt(df.find(f"{ns}Content"))
                    if content is not None and content not in docs:
                        docs.append(content)
                term = None
                dur = enc.find(f"{ns}Duration")
                if dur is not None:
                    term_el = dur.find(f"{ns}Term")
                    start = _txt(dur.find(f"{ns}Started"))
                    stop = _txt(dur.find(f"{ns}Stopped"))
                    if term_el is not None:
                        term = term_el.text
                    elif start is not None and stop is not None:
                        term = f"c {start} по {stop}"
                    else:
                        term = ""  # Duration present, no usable term
                holders = []
                owner_el = enc.find(f"{ns}Owner")
                if owner_el is not None:
                    for child in owner_el:
                        if child.tag == f"{ns}Person":
                            fio = " ".join(
                                n.text for n in child.findall(f"{ns}FIO/") if n.text
                            )
                            holders.append(fio + " " if fio else None)
                        elif child.tag == f"{ns}Organization":
                            content = _txt(child.find(f"{ns}Content"))
                            holders.append(_inn_rewrite(content) if content else "н/д")
                        elif child.tag == f"{ns}Governance":
                            nm = _txt(child.find(f"{ns}Name"))
                            if nm:
                                holders.append(nm + " ")
                if not holders:
                    holders = [None]
                for holder in holders:
                    rows.append(
                        {
                            "enc_code": None,
                            "enc_name": name,
                            "holder": holder,
                            "share_text": share_text,
                            "docs": docs or None,
                            "term": term,
                            "reg_number": None,
                            "reg_date": None,
                        }
                    )
    if not rows:
        enc_gkn = (
            fallback_container.find(f"{ns}Encumbrances")
            if fallback_container is not None
            else None
        )
        if enc_gkn is not None:
            for enc in enc_gkn.findall(f"{ns}Encumbrance"):
                code = _txt(enc.find(f"{ns}Type"))
                org = enc.find(
                    f"{ns}OwnersRestrictionInFavorem/{ns}OwnerRestrictionInFavorem/"
                    f"{ns}Organization/{ns}Name"
                )
                person = enc.find(
                    f"{ns}OwnersRestrictionInFavorem/{ns}OwnerRestrictionInFavorem/"
                    f"{ns}Person"
                )
                holder = None
                if org is not None:
                    holder = org.text
                elif person is not None:
                    parts = [
                        _txt(person.find(f"{ns}FamilyName")),
                        _txt(person.find(f"{ns}FirstName")),
                        _txt(person.find(f"{ns}Patronymic")),
                    ]
                    holder = " ".join(p for p in parts if p) or None
                reg_number = _txt(enc.find(f"{ns}Registration/{ns}RegNumber"))
                if reg_number is None:
                    reg_number = _txt(enc.find(f"{ns}CadastralNumberRestriction"))
                rows.append(
                    {
                        "enc_code": code,
                        "enc_name": None,
                        "holder": holder,
                        "share_text": None,
                        "docs": None,
                        "term": None,
                        "reg_number": reg_number,
                        "reg_date": _txt(enc.find(f"{ns}Registration/{ns}RegDate")),
                    }
                )
    return rows


# --- EGRN (new-style) rights / encumbrances ----------------------------------


def _egrn_holder_names(holder_el: ET.Element) -> list[str]:
    """right_holder / subject children -> names (real_estate.py:1119-1209
    holder kinds: individual, public_formation, legal_entity)."""
    names: list[str] = []
    for child in holder_el:
        if child.tag == "individual":
            parts = [
                _txt(child.find("surname")),
                _txt(child.find("name")),
                _txt(child.find("patronymic")),
            ]
            nm = " ".join(p for p in parts if p)
            if nm:
                names.append(nm)
        elif child.tag == "public_formation":
            pft = child.find("public_formation_type")
            if pft is None:
                continue
            for kind in pft:
                if kind.tag in ("russia", "subject_of_rf", "foreign_public"):
                    value = kind.find("name/value")
                    if value is not None and value.text:
                        names.append(value.text)
                elif kind.tag in ("union_state", "municipality"):
                    nm = _txt(kind.find("name"))
                    if nm:
                        names.append(nm)
        elif child.tag == "legal_entity":
            entity = child.find("entity")
            if entity is None:
                continue
            resident = entity.find("resident")
            not_resident = entity.find("not_resident")
            government = entity.find("government_entity")
            name_el = inn_el = None
            if resident is not None:
                name_el = resident.find("name")
                inn_el = resident.find("inn")
            elif not_resident is not None:
                name_el = not_resident.find("name")
            elif government is not None:
                name_el = government.find("full_name")
            if name_el is not None and inn_el is not None:
                names.append(f"{name_el.text} ИНН: {inn_el.text}")
            elif name_el is not None and name_el.text:
                names.append(name_el.text)
    return names


def _egrn_rights(right_records: ET.Element | None) -> list[dict]:
    """right_record -> structured rows (real_estate.py:1089-1239)."""
    rows: list[dict] = []
    if right_records is None:
        return rows
    for record in right_records.findall("right_record"):
        right_data = record.find("right_data")
        if right_data is None:
            continue
        r_type = _txt(right_data.find("right_type/value"))
        share_num = share_den = share_text = None
        if r_type == "Общая долевая собственность":
            shares = right_data.find("shares")
            if shares is not None:
                share = shares.find("share")
                if share is not None:
                    share_num = _txt(share.find("numerator"))
                    share_den = _txt(share.find("denominator"))
            else:
                desc = _txt(right_data.find("share_description"))
                if desc and "/" in desc:
                    share_num, share_den = desc.split("/", 1)
            if share_num is not None and share_den is not None:
                share_text = f"{share_num}/{share_den}"
        reg_number = _txt(right_data.find("right_number"))
        record_info = record.find("record_info")
        reg_date = (
            _txt(record_info.find("registration_date")) if record_info is not None else None
        )
        holders = record.find("right_holders")
        names = []
        if holders is not None:
            for holder in holders.findall("right_holder"):
                names.extend(_egrn_holder_names(holder))
        if not names:
            names = [None]
        for k, name in enumerate(names):
            rows.append(
                {
                    "right_code": None,
                    "right_type": r_type,
                    "owner": name,
                    "share_num": share_num,
                    "share_den": share_den,
                    "share_text": share_text,
                    "reg_name": None,
                    "reg_number": reg_number,
                    "reg_date": reg_date,
                    "rec_first": k == 0,  # r_type_list/share_list per RECORD
                    "gkn": False,
                }
            )
    return rows


def _egrn_encumbrances(restrict_records: ET.Element | None) -> list[dict]:
    """restrict_record -> structured rows (real_estate.py:1272-1455)."""
    rows: list[dict] = []
    if restrict_records is None:
        return rows
    for record in restrict_records.findall("restrict_record"):
        data = record.find("restrictions_encumbrances_data")
        if data is None:
            continue
        enc_name = _txt(data.find("restriction_encumbrance_type/value"))
        reg_number = _txt(data.find("restriction_encumbrance_number"))
        record_info = record.find("record_info")
        reg_date = None
        if record_info is not None:
            rd = _txt(record_info.find("registration_date"))
            reg_date = rd[:10] if rd else None
        term = None
        period = data.find("period")
        if period is not None:
            info = period.find("period_info")
            ddu = period.find("period_ddu")
            if info is not None:
                start = _txt(info.find("start_date"))
                end = _txt(info.find("end_date"))
                validity = _txt(info.find("deal_validity_time"))
                if start is not None and end is not None:
                    term = f"срок действия: с {start} по {end}"
                elif start is not None and validity is not None:
                    term = f"срок действия: с {start} на {validity}"
            if ddu is not None:
                first = _txt(ddu.find("first_ddu_date"))
                deadline = _txt(ddu.find("transfer_deadline"))
                if first is not None and deadline is not None:
                    term = (
                        f"дата регистрации первого ДДУ {first}, "
                        f"срок передачи застройщиком объекта {deadline}"
                    )
        holders: list[str | None] = []
        parties = record.find("restrict_parties")
        right_holders = record.find("right_holders")
        subjects: list[ET.Element] = []
        if parties is not None:
            rrp = parties.find("restricted_rights_parties")
            if rrp is not None:
                for party in rrp.findall("restricted_rights_party"):
                    subject = party.find("subject")
                    if subject is not None:
                        subjects.append(subject)
        elif right_holders is not None:
            subjects.extend(right_holders.findall("right_holder"))
        for subject in subjects:
            names = _egrn_holder_names(subject)
            # extra EGRN-only holder kinds (real_estate.py:1389-1400)
            for child in subject:
                if child.tag == "public_servitude":
                    pub = _txt(child.find("public"))
                    if pub:
                        names.append(pub)
                elif child.tag == "undefined":
                    und = _txt(child.find("undefined"))
                    if und:
                        names.append(und)
            holders.extend(names)
        if not holders:
            holders = [None]
        for holder in holders:
            rows.append(
                {
                    "enc_code": None,
                    "enc_name": enc_name,
                    "holder": holder,
                    "share_text": None,
                    "docs": None,
                    "term": term,
                    "reg_number": reg_number,
                    "reg_date": reg_date,
                }
            )
    return rows


# --- per-family parsers -------------------------------------------------------


def _kvzu_address_parts(container: ET.Element | None, ns: str, adr: str) -> dict:
    """Location/Address -> Note (address-output ns) + raw fallback parts
    (real_estate.py:824-858: Region code, District/Locality name+type);
    the human-readable address string is built downstream with the
    broadcast region dimension."""
    out = {
        "address_note": None,
        "region_code": None,
        "district_name": None,
        "district_type": None,
        "locality_name": None,
        "locality_type": None,
    }
    if container is None:
        return out
    note = container.find(f"{adr}Note")
    if note is None:
        note = container.find(f"{ns}Note")
    if note is None:
        note = container.find("Note")
    if note is not None and note.text:
        # a bare ',' means empty (real_estate.py:841-843)
        out["address_note"] = "" if note.text == "," else note.text
    region = container.find(f"{adr}Region")
    district = container.find(f"{adr}District")
    locality = container.find(f"{adr}Locality")
    if region is not None:
        out["region_code"] = region.text
    if district is not None:
        out["district_name"] = district.get("Name")
        out["district_type"] = district.get("Type")
    if locality is not None:
        out["locality_name"] = locality.get("Name")
        out["locality_type"] = locality.get("Type")
    return out


def _occ_address_fragments(container: ET.Element | None, adr: str) -> list[str] | None:
    """OCC address fallback long tail (real_estate.py:1721-1753): the
    ordered ', '-joined fragments AFTER the region classifier — District
    (Name Type), City (Type Name), UrbanDistrict (Name Type), Locality
    (Type Name), Street (Name Type), Level1-3 / Apartment (Type Value).
    Emitted pre-formatted so the downstream concat is pure Column work.
    """
    if container is None:
        return None
    parts: list[str] = []
    spec = [
        ("District", "Name", "Type"),
        ("City", "Type", "Name"),
        ("UrbanDistrict", "Name", "Type"),
        ("Locality", "Type", "Name"),
        ("Street", "Name", "Type"),
        ("Level1", "Type", "Value"),
        ("Level2", "Type", "Value"),
        ("Level3", "Type", "Value"),
        ("Apartment", "Type", "Value"),
    ]
    for tag, first, second in spec:
        el = container.find(f"{adr}{tag}")
        if el is not None:
            parts.append(f"{el.get(first)} {el.get(second)}")
    return parts or None


def _parse_kvzu_family(root: ET.Element, ns_uri: str, schema: str) -> list[dict]:
    """KVZU (Parcels/Parcel) and KPZU (Parcel) share the whole attribute
    family (AbstractParcel, real_estate.py:798-951)."""
    ns = "{%s}" % ns_uri
    spa = "{%s}" % SPA_NS
    adr = "{%s}" % ADR_NS
    eor = root.find(f"{ns}ReestrExtract/{ns}ExtractObjectRight")
    right_claim = (
        _txt(eor.find(f"{ns}ExtractObject/{ns}RightClaim")) if eor is not None else None
    )
    rows = []
    parcels = root.findall(f"{ns}Parcels/{ns}Parcel") or root.findall(f"{ns}Parcel")
    for parcel in parcels:
        cad = parcel.get("CadastralNumber")
        # area: Area/Area, NOT Area/Value (real_estate.py:813-822)
        area = _txt(parcel.find(f"{ns}Area/{ns}Area"))
        cat = _txt(parcel.find(f"{ns}Category"))
        location_addr = parcel.find(f"{ns}Location/{ns}Address")
        addr = _kvzu_address_parts(location_addr, ns, adr)
        # permitted use: ByDoc attr else Utilization code (:888-902)
        util = parcel.find(f"{ns}Utilization")
        by_doc = util.get("ByDoc") if util is not None else None
        util_code = util.get("Utilization") if util is not None else None
        cost = parcel.find(f"{ns}CadastralCost")
        # DateCreatedDoc preferred over DateCreated (:706-715)
        date_created = parcel.get("DateCreatedDoc") or parcel.get("DateCreated")
        entry = [
            ep.get("CadastralNumber")
            for ep in parcel.findall(f"{ns}CompositionEZ/{ns}EntryParcel")
        ]
        inner = [
            _txt(cn)
            for cn in parcel.findall(f"{ns}InnerCadastralNumbers/{ns}CadastralNumber")
        ]
        # geometry: CompositionEZ entry parcels / Contours / the parcel
        # itself (:939-951)
        result: dict[str, bytes] = {}
        comp = parcel.find(f"{ns}CompositionEZ")
        contours_el = parcel.find(f"{ns}Contours")
        if comp is not None:
            for ep in comp.findall(f"{ns}EntryParcel"):
                g = _kvzu_container_rings(ep, ns, spa)
                if g is not None:
                    result[ep.get("CadastralNumber")] = g
        elif contours_el is not None:
            for ct in contours_el.findall(f"{ns}Contour"):
                g = _kvzu_container_rings(ct, ns, spa)
                if g is not None:
                    result[f"{cad}({ct.get('NumberRecord')})"] = g
        else:
            g = _kvzu_container_rings(parcel, ns, spa)
            if g is not None:
                result[cad] = g
        rows.append(
            {
                "source_schema": schema,
                "obj_type": TYPE_PARCEL,
                "cad_number": cad,
                "area": area,
                "status_code": parcel.get("State"),
                "category_code": cat,
                "permitted_use_by_doc": by_doc,
                "permitted_use_code": util_code,
                **addr,
                "cadastral_cost": cost.get("Value") if cost is not None else None,
                "special_notes": _txt(parcel.find(f"{ns}SpecialNote")),
                # ExtractDate text arrives already dd.mm.yyyy (:684-695)
                "extract_date": _txt(
                    root.find(
                        f"{ns}ReestrExtract/{ns}ExtractObjectRight/{ns}FootContent/{ns}ExtractDate"
                    )
                ),
                "date_reg": _invert_date(date_created),
                "entry_parcels": entry or None,
                "estate_objects": [c for c in inner if c] or None,
                "rights": _kvzu_rights(eor, parcel, ns) or None,
                "encumbrances": _kvzu_encumbrances(eor, parcel, ns) or None,
                "contours": _contours_dict_to_rows(result) or None,
                "geom": result.get(cad),
                "right_claim": right_claim,
                "error": None,
            }
        )
    return rows


def _parse_occ(root: ET.Element, ns_uri: str, schema: str) -> list[dict]:
    """KVOKS/KPOKS: capital-construction Realty objects; land attributes
    stubbed to '-' so all types fit one table (real_estate.py:1771-1787)."""
    ns = "{%s}" % ns_uri
    spa = "{%s}" % SPA_NS
    adr = "{%s}" % ADR_NS
    param = "{%s}" % PARAM_NS
    eor = root.find(f"{ns}ReestrExtract/{ns}ExtractObjectRight")
    rows = []
    for realty in root.findall(f"{ns}Realty"):
        for obj in list(realty):
            cad = obj.get("CadastralNumber")
            if cad is None:
                continue
            # area: Area text else KeyParameter[Type=05]@Value (:1683-1701)
            area = _txt(obj.find(f"{ns}Area"))
            if area is None:
                kp = obj.find(f"{ns}KeyParameters/{param}KeyParameter")
                if kp is None:
                    kp = obj.find(f"{ns}KeyParameters/{ns}KeyParameter")
                if kp is not None and kp.get("Type") == "05":
                    area = kp.get("Value")
                else:
                    area = "0.0"
            addr = _kvzu_address_parts(obj.find(f"{ns}Address"), ns, adr)
            addr["address_parts"] = _occ_address_fragments(
                obj.find(f"{ns}Address"), adr
            )
            cost = obj.find(f"{ns}CadastralCost")
            date_created = obj.get("DateCreatedDoc") or obj.get("DateCreated")
            flats = [
                flat.get("CadastralNumber")
                for flat in obj.findall(f"{ns}Flats/{ns}Flat")
            ]
            geom = _occ_container_rings(obj, ns, spa)
            rows.append(
                {
                    "source_schema": schema,
                    "obj_type": TYPE_OCC,
                    "cad_number": cad,
                    "area": area,
                    "status_code": obj.get("State"),
                    "category_code": "-",  # OCC stub (:1771-1787)
                    "permitted_use_by_doc": "-",
                    **addr,
                    "cadastral_cost": cost.get("Value") if cost is not None else None,
                    "special_notes": _txt(obj.find(f"{ns}Notes")),
                    "extract_date": _txt(
                        root.find(
                            f"{ns}ReestrExtract/{ns}ExtractObjectRight/{ns}FootContent/{ns}ExtractDate"
                        )
                    ),
                    "date_reg": _invert_date(date_created),
                    "entry_parcels": None,
                    "estate_objects": [c for c in flats if c] or None,
                    "rights": _kvzu_rights(eor, obj, ns) or None,
                    "encumbrances": _kvzu_encumbrances(eor, obj, ns) or None,
                    "contours": [{"geom_key": cad, "geom": geom}] if geom else None,
                    "geom": geom,
                    "error": None,
                }
            )
    return rows


def _egrn_common(root: ET.Element, rec: ET.Element) -> dict:
    """Columns shared by land_record and build_record (ObjectEGRN,
    real_estate.py:985-1074,1451-1505)."""
    record_info = rec.find("record_info")
    reg_date = (
        _txt(record_info.find("registration_date")) if record_info is not None else None
    )
    extract_date = _txt(
        root.find("details_statement/group_top_requisites/date_formation")
    )
    return {
        "cad_number": _txt(rec.find("object/common_data/cad_number")),
        "status": _txt(root.find("status")),  # direct root child (:1019-1026)
        "address_note": _txt(rec.find("address_location/address/readable_address")),
        "cadastral_cost": _txt(rec.find("cost/value")),
        "special_notes": _txt(rec.find("special_notes")),
        "extract_date": _invert_date(extract_date),
        "date_reg": _invert_date(reg_date),
        "rights": _egrn_rights(root.find("right_records")) or None,
        "encumbrances": _egrn_encumbrances(root.find("restrict_records")) or None,
    }


_ENTRY_NOTES_RE = re.compile(
    r"Кадастровые номера обособленных \(условных\) участков, входящих в единое землепользование:"
)


def _parse_land_record(root: ET.Element) -> list[dict]:
    """extract_about_property_land (ParcelEGRN, real_estate.py:1560-1635)."""
    rows = []
    for rec in root.iter("land_record"):
        common = _egrn_common(root, rec)
        cad = common["cad_number"]
        # entry parcels: cad_links/common_land chain, else parsed out of
        # special_notes by regex (:1585-1607)
        entry = [
            _txt(icn.find("cad_number"))
            for icn in rec.findall(
                "cad_links/common_land/common_land_parts/included_cad_numbers/included_cad_number"
            )
        ]
        entry = [e for e in entry if e]
        if not entry:
            notes = common["special_notes"] or ""
            if _ENTRY_NOTES_RE.search(notes):
                entry = re.findall(r"\d+:\d+:\d+:\d+", notes)
        inner = [
            _txt(io_.find("cad_number"))
            for io_ in rec.findall("cad_links/included_objects/included_object")
        ]
        # multi-contour geometry: one entry per contour keyed
        # cad_number / number_pp / parent (:1612-1635), LWW within a key
        result: dict[str, bytes] = {}
        for contour in rec.findall("contours_location/contours/contour"):
            key = _txt(contour.find("cad_number")) or _txt(contour.find("number_pp")) or cad
            g = _egrn_container_rings(contour)
            if g is not None:
                result[key] = g
        by_doc = _txt(
            rec.find("params/permitted_use/permitted_use_established/by_document")
        )
        if by_doc is None:
            by_doc = _txt(
                rec.find("params/permitted_use/permitted_use_established/land_use/value")
            )
        rows.append(
            {
                "source_schema": "land_record",
                "obj_type": TYPE_PARCEL,
                **common,
                "area": _txt(rec.find("params/area/value")),
                "category_code": _txt(rec.find("params/category/type/code")),
                "permitted_use_by_doc": by_doc,
                "entry_parcels": entry or None,
                "estate_objects": [c for c in inner if c] or None,
                "contours": _contours_dict_to_rows(result) or None,
                "geom": result.get(cad),
                "error": None,
            }
        )
    return rows


def _parse_build_record(root: ET.Element) -> list[dict]:
    """extract_about_property_build (BuildingEGRN, real_estate.py:1874-1925):
    land-only attributes stubbed '-'; contours live directly under
    build_record/contours and are all keyed by the parent CN (LWW)."""
    rows = []
    for rec in root.iter("build_record"):
        common = _egrn_common(root, rec)
        cad = common["cad_number"]
        result: dict[str, bytes] = {}
        for contour in rec.findall("contours/contour"):
            g = _egrn_container_rings(contour)
            if g is not None:
                result[cad] = g  # same key each time -> last contour wins (:1900-1908)
        rooms = [
            _txt(rcn.find("cad_number"))
            for rcn in rec.findall("cad_links/room_cad_numbers/room_cad_number")
        ]
        rows.append(
            {
                "source_schema": "build_record",
                "obj_type": TYPE_OCC,
                **common,
                "area": _txt(rec.find("params/area")),
                "category_code": "-",  # OCC stub (real_estate.py:1771-1787)
                "permitted_use_by_doc": "-",
                "entry_parcels": None,
                "estate_objects": [c for c in rooms if c] or None,
                "contours": _contours_dict_to_rows(result) or None,
                "geom": result.get(cad),
                "error": None,
            }
        )
    return rows


def parse_extract(doc_id: str, content: bytes | str) -> list[dict]:
    """One extract document -> rows (dispatch + project + assemble).

    EVERY per-document failure lands in the error bucket instead of
    failing the task — the reference's per-file log-and-continue
    discipline (main.py:33-49 @logger, :458-459 xml_errors): one
    malformed coordinate in a 10^8-file ingest must cost one row, not
    a stage retry storm.
    """
    base = {c: None for c in _COLS}
    base["doc_id"] = doc_id
    try:
        root = ET.fromstring(content)
    except ET.ParseError as e:
        return [{**base, "error": f"parse_error: {e}"}]
    ns = "{%s}" % KVZU_NS
    ns2 = "{%s}" % KPZU_NS
    try:
        if root.find(f"{ns}Parcels/{ns}Parcel") is not None:
            rows = _parse_kvzu_family(root, KVZU_NS, "KVZU")
        elif root.find(f"{ns2}Parcel") is not None:
            rows = _parse_kvzu_family(root, KPZU_NS, "KPZU")
        elif root.find("land_record") is not None:
            rows = _parse_land_record(root)
        elif root.find("build_record") is not None:
            rows = _parse_build_record(root)
        elif root.find("{%s}Realty" % KVOKS_NS) is not None:
            rows = _parse_occ(root, KVOKS_NS, "KVOKS")
        elif root.find("{%s}Realty" % KPOKS_NS) is not None:
            rows = _parse_occ(root, KPOKS_NS, "KPOKS")
        else:
            return [{**base, "error": "unsupported_schema"}]
    except Exception as e:  # noqa: BLE001 — quarantine, never fail the task
        return [{**base, "error": f"{type(e).__name__}: {e}"}]
    return [{**base, **r} for r in rows]


def parse_extracts(files: DataFrame) -> DataFrame:
    """(path string, content binary) -> parcel rows, error bucket included."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_extract(path, bytes(content)))
            out = pd.DataFrame(rows, columns=_COLS)
            # struct columns cross Arrow as dicts; missing -> None
            yield out

    return files.mapInPandas(batches, schema=PARCEL_ROW_SCHEMA)


def extract_zip_contents(files: DataFrame, drop_suffixes: tuple[str, ...] = (".sig",)) -> DataFrame:
    """Two-level ZIP unpack as a distributed transform (S2).

    The reference unpacks all ``.zip``, then zips nested one level deeper,
    and deletes ``.sig`` companions (/root/reference/logic.py:83-93,
    main.py:149-175) — on the local filesystem, serially.  Here the
    archive bytes arrive as (path, content) rows and fan out to their
    member files in ``mapInPandas``; non-zip rows pass through unchanged,
    so the operator composes directly with :func:`parse_extracts`.
    """
    import io
    import zipfile

    def unpack(name: str, data: bytes, depth: int) -> list[tuple[str, bytes]]:
        if depth < 0 or not zipfile.is_zipfile(io.BytesIO(data)):
            return [(name, data)]
        out: list[tuple[str, bytes]] = []
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            for member in z.namelist():
                if member.endswith("/"):
                    continue
                out.extend(unpack(f"{name}!{member}", z.read(member), depth - 1))
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple[str, bytes]] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if str(path).lower().endswith(".zip"):
                    rows.extend(unpack(str(path), data, depth=2))
                else:
                    rows.append((str(path), data))
            keep = [
                (p, c)
                for p, c in rows
                if not any(p.lower().endswith(s) for s in drop_suffixes)
            ]
            yield pd.DataFrame(keep, columns=["path", "content"])

    return files.mapInPandas(batches, schema="path string, content binary")


def read_extract_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .xml files -> (path, content) via the binaryFile
    source (distributed listing + read; the reference's os.listdir +
    per-file loop at main.py:157-158,347)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .load(path)
        .select("path", "content")
    )
