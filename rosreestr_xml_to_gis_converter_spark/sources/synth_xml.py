"""Deterministic synthetic EGRN-extract XML (shape-true fixtures).

Regenerates the *structure* the reference parses — element paths,
namespaces and attributes from /root/reference/real_estate.py — with
synthetic values; no GPL content copied.  Pure functions of their
arguments.

Structural parity points locked here (ADVICE round 1):
* geometry elements live in the entity-spatial namespace
  (urn://...entity-spatial/5.0.1, real_estate.py:965-981);
* KVZU/KPZU area is ``Area/Area`` (:813-822), address is
  ``Location/Address/{adrs}Note`` (:824-858);
* ``DateCreatedDoc`` is preferred over ``DateCreated`` (:706-715);
* EGRN geometry is ``entity_spatial/spatials_elements/spatial_element/
  ordinates/ordinate`` with ``x`` and ``_y``-или-``y`` children
  (:1516-1540).
"""

from __future__ import annotations

import numpy as np

from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import (
    ADR_NS,
    KPZU_NS,
    KVZU_NS,
    SPA_NS,
)


def _spatial_xml(rings: list[np.ndarray], start_label: int = 0) -> str:
    """Rings (easting, northing) -> one EntitySpatial in the
    entity-spatial namespace with SuNmb vertex labels.

    EGRN Ordinate semantics (the reason the reference swaps at
    real_estate.py:746-748): attribute ``X`` is the NORTHING and ``Y``
    the EASTING, so the parser's ``[Y, X]`` emission yields conventional
    (x=easting, y=northing) pairs.
    """
    parts = ["<EntitySpatial>"]
    label = start_label
    for ring in rings:
        parts.append("<spa:SpatialElement>")
        first_label = label + 1
        n = len(ring)
        for i, (easting, northing) in enumerate(ring):
            if i == n - 1:
                su = first_label  # closing vertex repeats the first label
            else:
                label += 1
                su = label
            parts.append(
                f'<spa:SpelementUnit SuNmb="{su}">'
                f'<spa:Ordinate X="{northing!r}" Y="{easting!r}"/>'
                "</spa:SpelementUnit>"
            )
        parts.append("</spa:SpatialElement>")
    parts.append("</EntitySpatial>")
    return "".join(parts)


def _egrn_spatial_xml(rings: list[np.ndarray], y_tag: str = "_y") -> str:
    """Rings -> EGRN entity_spatial block; ring closure is detected by a
    REPEATED COORDINATE PAIR (real_estate.py:1534-1540), which the
    closing vertex provides naturally."""
    parts = ["<entity_spatial><spatials_elements>"]
    for ring in rings:
        parts.append("<spatial_element><ordinates>")
        for easting, northing in ring:
            parts.append(
                f"<ordinate><x>{northing!r}</x><{y_tag}>{easting!r}</{y_tag}></ordinate>"
            )
        parts.append("</ordinates></spatial_element>")
    parts.append("</spatials_elements></entity_spatial>")
    return "".join(parts)


def rights_block_kvzu(rights: list[dict]) -> str:
    """[{code, owner, kind='person'|'org'|'gov', share=(num,den)|None,
    share_text, reg_name}] -> ReestrExtract/ExtractObjectRight block
    (real_estate.py:201-276)."""
    items = []
    for r in rights:
        reg = f"<Type>{r['code']}</Type>"
        if r.get("reg_name"):
            reg += f"<Name>{r['reg_name']}</Name>"
        if r.get("share_text"):
            reg += f"<ShareText>{r['share_text']}</ShareText>"
        elif r.get("share"):
            num, den = r["share"]
            reg += f'<Share Numerator="{num}" Denominator="{den}"/>'
        kind = r.get("kind", "person")
        owner = ""
        if r.get("owner") is not None:
            if kind == "person":
                owner = f"<Owner><Person><Content>{r['owner']}</Content></Person></Owner>"
            elif kind == "org":
                owner = f"<Owner><Organization><Content>{r['owner']}</Content></Organization></Owner>"
            else:
                owner = f"<Owner><Governance><Name>{r['owner']}</Name></Governance></Owner>"
        items.append(f"<Right><Registration>{reg}</Registration>{owner}</Right>")
    return (
        "<ReestrExtract><ExtractObjectRight><ExtractObject><ObjectRight>"
        + "".join(items)
        + "</ObjectRight></ExtractObject>"
        + "<FootContent><ExtractDate>15.06.2023</ExtractDate></FootContent>"
        + "</ExtractObjectRight></ReestrExtract>"
    )


def encumbrance_block_kvzu(encs: list[dict]) -> str:
    """[{name, owner?, kind?, share_text?, docs?, term?|(start,stop)?}] ->
    Encumbrance elements nested in one extra Right (real_estate.py:498-575)."""
    items = []
    for e in encs:
        inner = f"<Name>{e['name']}</Name>"
        if e.get("share_text"):
            inner += f"<ShareText>{e['share_text']}</ShareText>"
        for d in e.get("docs", []):
            inner += f"<DocFound><Content>{d}</Content></DocFound>"
        if e.get("term"):
            inner += f"<Duration><Term>{e['term']}</Term></Duration>"
        elif e.get("period"):
            start, stop = e["period"]
            inner += f"<Duration><Started>{start}</Started><Stopped>{stop}</Stopped></Duration>"
        elif e.get("empty_duration"):
            inner += "<Duration/>"  # present but empty -> rent_term ''
        if e.get("owner") is not None:
            kind = e.get("kind", "org")
            if kind == "org":
                inner += f"<Owner><Organization><Content>{e['owner']}</Content></Organization></Owner>"
            elif kind == "person":
                fio = "".join(f"<x>{p}</x>" for p in e["owner"].split(" "))
                inner += f"<Owner><Person><FIO>{fio}</FIO></Person></Owner>"
            else:
                inner += f"<Owner><Governance><Name>{e['owner']}</Name></Governance></Owner>"
        items.append(f"<Encumbrance>{inner}</Encumbrance>")
    return f"<Right>{''.join(items)}</Right>"


def kvzu_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "1000",
    category: str = "003001000000",
    address: str = "обл. Тверская, р-н Калининский",
    date_created: str = "2020-05-17",
    date_created_doc: str | None = None,
    state: str = "06",
    cadastral_cost: str | None = "150000.5",
    special_note: str | None = None,
    utilization_code: str | None = None,
    utilization_by_doc: str | None = "для сельскохозяйственного производства",
    extra_entity: list[np.ndarray] | None = None,
    entry_parcels: list[str] | None = None,
    entry_rings: dict[str, list[np.ndarray]] | None = None,
    contour_rings: dict[str, list[np.ndarray]] | None = None,
    rights: list[dict] | None = None,
    encumbrances: list[dict] | None = None,
    region: str | None = None,
    district: tuple[str, str] | None = None,
    inner_cad_numbers: list[str] | None = None,
    right_claim: str | None = None,
) -> str:
    """KVZU-style extract (namespaced; dispatch at real_estate.py:53-54).

    ``entry_rings``: composite-parcel geometry keyed by entry CN;
    ``contour_rings``: multi-contour geometry keyed by NumberRecord.
    """
    geom = ""
    if entry_parcels or entry_rings:
        eps = []
        for cn in entry_parcels or sorted(entry_rings or {}):
            inner = _spatial_xml(entry_rings[cn]) if entry_rings and cn in entry_rings else ""
            eps.append(f'<EntryParcel CadastralNumber="{cn}">{inner}</EntryParcel>')
        geom += "<CompositionEZ>" + "".join(eps) + "</CompositionEZ>"
    elif contour_rings:
        cts = [
            f'<Contour NumberRecord="{nr}">{_spatial_xml(r)}</Contour>'
            for nr, r in contour_rings.items()
        ]
        geom += "<Contours>" + "".join(cts) + "</Contours>"
    else:
        if rings is not None:
            geom += _spatial_xml(rings)
        if extra_entity is not None:
            geom += _spatial_xml(extra_entity, start_label=1000)
    dcd = f' DateCreatedDoc="{date_created_doc}"' if date_created_doc else ""
    util = ""
    if utilization_by_doc is not None or utilization_code is not None:
        attrs = ""
        if utilization_by_doc is not None:
            attrs += f' ByDoc="{utilization_by_doc}"'
        if utilization_code is not None:
            attrs += f' Utilization="{utilization_code}"'
        util = f"<Utilization{attrs}/>"
    cost = f'<CadastralCost Value="{cadastral_cost}"/>' if cadastral_cost else ""
    note = f"<SpecialNote>{special_note}</SpecialNote>" if special_note else ""
    addr_inner = f"<adrs:Note>{address}</adrs:Note>" if address is not None else ""
    if region is not None:
        addr_inner += f"<adrs:Region>{region}</adrs:Region>"
    if district is not None:
        addr_inner += f'<adrs:District Name="{district[0]}" Type="{district[1]}"/>'
    inner_cns = ""
    if inner_cad_numbers:
        inner_cns = (
            "<InnerCadastralNumbers>"
            + "".join(f"<CadastralNumber>{c}</CadastralNumber>" for c in inner_cad_numbers)
            + "</InnerCadastralNumbers>"
        )
    # real extracts always carry ReestrExtract/ExtractObjectRight with a
    # FootContent/ExtractDate (real_estate.py:684-695)
    rights_block = rights_block_kvzu(rights or [])
    if right_claim is not None:
        rights_block = rights_block.replace(
            "</ObjectRight>", f"</ObjectRight><RightClaim>{right_claim}</RightClaim>"
        )
    if encumbrances:
        enc = encumbrance_block_kvzu(encumbrances)
        rights_block = rights_block.replace("</ObjectRight>", enc + "</ObjectRight>")
    return f"""<?xml version="1.0" encoding="utf-8"?>
<KVZU xmlns="{KVZU_NS}" xmlns:spa="{SPA_NS}" xmlns:adrs="{ADR_NS}">
 <Parcels>
  <Parcel CadastralNumber="{cad}" DateCreated="{date_created}"{dcd} State="{state}">
   <Area><Area>{area}</Area></Area>
   <Category>{category}</Category>
   <Location><Address>{addr_inner}</Address></Location>
   {util}{cost}{note}{inner_cns}
   {geom}
  </Parcel>
 </Parcels>
 {rights_block}
</KVZU>"""


def land_record_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "2500",
    category: str = "003002000000",
    address: str = "Московская область, г. Руза",
    reg_date: str = "2021-11-03",
    date_formation: str = "2023-06-15",
    cost: str | None = "98000.12",
    special_notes: str | None = None,
    by_document: str | None = "для ведения огородничества",
    contours: dict[str, list[np.ndarray]] | None = None,
    right_records: str = "",
    restrict_records: str = "",
    entry_cad_numbers: list[str] | None = None,
) -> str:
    """New-style EGRN extract (dispatch at real_estate.py:57-58).

    ``contours``: multi-contour geometry keyed by the contour's
    cad_number child (real_estate.py:1621-1633)."""
    geom = ""
    if contours:
        cts = [
            f"<contour><cad_number>{k}</cad_number>{_egrn_spatial_xml(r)}</contour>"
            for k, r in contours.items()
        ]
        geom = f"<contours_location><contours>{''.join(cts)}</contours></contours_location>"
    elif rings is not None:
        inner = f"<contour><cad_number>{cad}</cad_number>{_egrn_spatial_xml(rings)}</contour>"
        geom = f"<contours_location><contours>{inner}</contours></contours_location>"
    cost_el = f"<cost><value>{cost}</value></cost>" if cost else ""
    notes = f"<special_notes>{special_notes}</special_notes>" if special_notes else ""
    pu = ""
    if by_document is not None:
        pu = (
            "<permitted_use><permitted_use_established>"
            f"<by_document>{by_document}</by_document>"
            "</permitted_use_established></permitted_use>"
        )
    links = ""
    if entry_cad_numbers:
        incs = "".join(
            f"<included_cad_number><cad_number>{c}</cad_number></included_cad_number>"
            for c in entry_cad_numbers
        )
        links = (
            "<cad_links><common_land><common_land_parts><included_cad_numbers>"
            + incs
            + "</included_cad_numbers></common_land_parts></common_land></cad_links>"
        )
    return f"""<?xml version="1.0" encoding="utf-8"?>
<extract_about_property_land>
 <details_statement><group_top_requisites>
  <date_formation>{date_formation}</date_formation>
 </group_top_requisites></details_statement>
 <land_record>
  <object><common_data><cad_number>{cad}</cad_number></common_data></object>
  <params>
   <area><value>{area}</value></area>
   <category><type><code>{category}</code></type></category>
   {pu}
  </params>
  <address_location><address><readable_address>{address}</readable_address></address></address_location>
  <record_info><registration_date>{reg_date}T00:00:00</registration_date></record_info>
  {cost_el}{notes}{links}
  {geom}
 </land_record>
 {right_records}
 {restrict_records}
</extract_about_property_land>"""


def egrn_right_records(rights: list[dict]) -> str:
    """[{type, holders: [('individual', 'Фамилия Имя Отчество') |
    ('legal', name, inn?) | ('municipality', name)], share=(num,den)?,
    number?, date?}] -> right_records (real_estate.py:1089-1239)."""
    records = []
    for r in rights:
        share = ""
        if r.get("share"):
            num, den = r["share"]
            share = (
                f"<shares><share><numerator>{num}</numerator>"
                f"<denominator>{den}</denominator></share></shares>"
            )
        holders = []
        for h in r.get("holders", []):
            if h[0] == "individual":
                parts = h[1].split(" ")
                inner = f"<surname>{parts[0]}</surname><name>{parts[1]}</name>"
                if len(parts) > 2:
                    inner += f"<patronymic>{parts[2]}</patronymic>"
                holders.append(f"<right_holder><individual>{inner}</individual></right_holder>")
            elif h[0] == "legal":
                inn = f"<inn>{h[2]}</inn>" if len(h) > 2 else ""
                holders.append(
                    "<right_holder><legal_entity><entity><resident>"
                    f"<name>{h[1]}</name>{inn}"
                    "</resident></entity></legal_entity></right_holder>"
                )
            elif h[0] == "municipality":
                holders.append(
                    "<right_holder><public_formation><public_formation_type>"
                    f"<municipality><name>{h[1]}</name></municipality>"
                    "</public_formation_type></public_formation></right_holder>"
                )
            elif h[0] == "russia":
                holders.append(
                    "<right_holder><public_formation><public_formation_type>"
                    f"<russia><name><value>{h[1]}</value></name></russia>"
                    "</public_formation_type></public_formation></right_holder>"
                )
            elif h[0] == "another":
                # 'Иной субъект права' — the reference appends NOTHING for
                # it (real_estate.py:1206-1207), shifting the positional
                # r_type_list x lst_holders pairing
                holders.append("<right_holder><another/></right_holder>")
        number = f"<right_number>{r['number']}</right_number>" if r.get("number") else ""
        date = (
            f"<record_info><registration_date>{r['date']}</registration_date></record_info>"
            if r.get("date")
            else ""
        )
        records.append(
            "<right_record><right_data>"
            f"<right_type><value>{r['type']}</value></right_type>{share}{number}"
            "</right_data>"
            f"<right_holders>{''.join(holders)}</right_holders>{date}"
            "</right_record>"
        )
    return f"<right_records>{''.join(records)}</right_records>"


def egrn_restrict_records(encs: list[dict]) -> str:
    """[{type, number?, date?, period=(start,end)?, holders=[...]}] ->
    restrict_records (real_estate.py:1272-1455)."""
    records = []
    for e in encs:
        period = ""
        if e.get("period"):
            start, end = e["period"]
            period = (
                f"<period><period_info><start_date>{start}</start_date>"
                f"<end_date>{end}</end_date></period_info></period>"
            )
        number = (
            f"<restriction_encumbrance_number>{e['number']}</restriction_encumbrance_number>"
            if e.get("number")
            else ""
        )
        date = (
            f"<record_info><registration_date>{e['date']}</registration_date></record_info>"
            if e.get("date")
            else ""
        )
        holders = []
        for h in e.get("holders", []):
            if h[0] == "individual":
                parts = h[1].split(" ")
                inner = f"<surname>{parts[0]}</surname><name>{parts[1]}</name>"
                if len(parts) > 2:
                    inner += f"<patronymic>{parts[2]}</patronymic>"
                holders.append(
                    "<restricted_rights_party><subject>"
                    f"<individual>{inner}</individual>"
                    "</subject></restricted_rights_party>"
                )
            elif h[0] == "legal":
                inn = f"<inn>{h[2]}</inn>" if len(h) > 2 else ""
                holders.append(
                    "<restricted_rights_party><subject><legal_entity><entity>"
                    f"<resident><name>{h[1]}</name>{inn}</resident>"
                    "</entity></legal_entity></subject></restricted_rights_party>"
                )
        parties = (
            "<restrict_parties><restricted_rights_parties>"
            + "".join(holders)
            + "</restricted_rights_parties></restrict_parties>"
            if holders
            else ""
        )
        records.append(
            "<restrict_record><restrictions_encumbrances_data>"
            f"<restriction_encumbrance_type><value>{e['type']}</value>"
            f"</restriction_encumbrance_type>{number}{period}"
            f"</restrictions_encumbrances_data>{parties}{date}</restrict_record>"
        )
    return f"<restrict_records>{''.join(records)}</restrict_records>"


def kpzu_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "750",
    category: str = "003003000000",
    address: str = "г. Тверь, ул. Советская",
    date_created: str = "2019-02-11",
    state: str = "01",
) -> str:
    """KPZU-style extract: single Parcel under the root (real_estate.py:55-56)."""
    geom = _spatial_xml(rings) if rings is not None else ""
    return f"""<?xml version="1.0" encoding="utf-8"?>
<KPZU xmlns="{KPZU_NS}" xmlns:spa="{SPA_NS}" xmlns:adrs="{ADR_NS}">
 <Parcel CadastralNumber="{cad}" DateCreated="{date_created}" State="{state}">
  <Area><Area>{area}</Area></Area>
  <Category>{category}</Category>
  <Location><Address><adrs:Note>{address}</adrs:Note></Address></Location>
  {geom}
 </Parcel>
</KPZU>"""


def build_record_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "450.7",
    address: str = "Московская область, г. Истра",
    reg_date: str = "2022-03-09",
    date_formation: str = "2023-06-15",
    n_contours: int = 1,
) -> str:
    """New-style building extract (real_estate.py:59-60; OCC family).
    Contours live directly under build_record/contours, all keyed by the
    parent CN (real_estate.py:1900-1908)."""
    geom = ""
    if rings is not None:
        cts = "".join(
            f"<contour>{_egrn_spatial_xml(rings)}</contour>" for _ in range(n_contours)
        )
        geom = f"<contours>{cts}</contours>"
    return f"""<?xml version="1.0" encoding="utf-8"?>
<extract_about_property_build>
 <details_statement><group_top_requisites>
  <date_formation>{date_formation}</date_formation>
 </group_top_requisites></details_statement>
 <build_record>
  <object><common_data><cad_number>{cad}</cad_number></common_data></object>
  <params><area>{area}</area></params>
  <address_location><address><readable_address>{address}</readable_address></address></address_location>
  <record_info><registration_date>{reg_date}T00:00:00</registration_date></record_info>
  {geom}
 </build_record>
</extract_about_property_build>"""


def kvoks_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "120.5",
    address: str = "г. Тверь, наб. Афанасия Никитина",
    date_created: str = "2018-07-30",
    kind: str = "Building",
    ns: str | None = None,
    key_parameter_area: str | None = None,
) -> str:
    """KVOKS/KPOKS-style capital-construction extract
    (real_estate.py:61-64): Realty wrapping a Building/Construction."""
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import KVOKS_NS, PARAM_NS

    ns = ns or KVOKS_NS
    geom = _spatial_xml(rings) if rings is not None else ""
    if key_parameter_area is not None:
        area_el = (
            "<KeyParameters>"
            f'<param:KeyParameter Type="05" Value="{key_parameter_area}"/>'
            "</KeyParameters>"
        )
    else:
        area_el = f"<Area>{area}</Area>"
    return f"""<?xml version="1.0" encoding="utf-8"?>
<KVOKS xmlns="{ns}" xmlns:spa="{SPA_NS}" xmlns:adrs="{ADR_NS}" xmlns:param="{PARAM_NS}">
 <Realty>
  <{kind} CadastralNumber="{cad}" DateCreated="{date_created}">
   {area_el}
   <Address><adrs:Note>{address}</adrs:Note></Address>
   {geom}
  </{kind}>
 </Realty>
</KVOKS>"""


def unsupported_xml() -> str:
    return '<?xml version="1.0"?><SomethingElse><x/></SomethingElse>'
