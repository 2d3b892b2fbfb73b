"""Deterministic synthetic EGRN-extract XML (shape-true fixtures).

Regenerates the *structure* the reference parses (element paths and
attributes from /root/reference/real_estate.py) with synthetic values —
no GPL content copied.  Pure functions of their arguments.
"""

from __future__ import annotations

import numpy as np

from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import KVZU_NS


def _spatial_xml(rings: list[np.ndarray], tag: str, unit: str, ord_tag: str) -> str:
    """Rings (easting, northing) -> EntitySpatial XML with SuNmb labels.

    EGRN Ordinate semantics (the reason the reference swaps at
    real_estate.py:746-748): attribute ``X`` is the NORTHING and ``Y`` is
    the EASTING, so the parser's ``[Y, X]`` emission yields conventional
    (x=easting, y=northing) pairs.
    """
    parts = [f"<{tag}>"]
    label = 0
    for ring in rings:
        parts.append("<SpatialElement>")
        first_label = label + 1
        n = len(ring)
        for i, (easting, northing) in enumerate(ring):
            if i == n - 1:
                su = first_label  # closing vertex repeats the first label
            else:
                label += 1
                su = label
            parts.append(
                f'<{unit} SuNmb="{su}"><{ord_tag} X="{northing!r}" Y="{easting!r}"/></{unit}>'
            )
        parts.append("</SpatialElement>")
    parts.append(f"</{tag}>")
    return "".join(parts)


def kvzu_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "1000",
    category: str = "003001000000",
    address: str = "обл. Тверская, р-н Калининский",
    date_created: str = "2020-05-17",
    extra_entity: list[np.ndarray] | None = None,
    entry_parcels: list[str] | None = None,
) -> str:
    """KVZU-style extract (namespaced; dispatch at real_estate.py:53-54)."""
    geom = ""
    if rings is not None:
        geom = _spatial_xml(rings, "EntitySpatial", "SpelementUnit", "Ordinate")
    if extra_entity is not None:
        geom += _spatial_xml(extra_entity, "EntitySpatial", "SpelementUnit", "Ordinate")
    if entry_parcels:
        geom += (
            "<CompositionEZ>"
            + "".join(f'<EntryParcel CadastralNumber="{cn}"/>' for cn in entry_parcels)
            + "</CompositionEZ>"
        )
    return f"""<?xml version="1.0" encoding="utf-8"?>
<KVZU xmlns="{KVZU_NS}">
 <Parcels>
  <Parcel CadastralNumber="{cad}" DateCreated="{date_created}">
   <Area><Value>{area}</Value></Area>
   <Category>{category}</Category>
   <Address><Note>{address}</Note></Address>
   {geom}
  </Parcel>
 </Parcels>
</KVZU>"""


def land_record_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "2500",
    category: str = "003002000000",
    address: str = "Московская область, г. Руза",
    reg_date: str = "2021-11-03",
) -> str:
    """New-style EGRN extract (dispatch at real_estate.py:57-58)."""
    geom = ""
    if rings is not None:
        inner = _spatial_xml(rings, "entity_spatial", "SpelementUnit", "Ordinate")
        geom = f"<contours_location><contours><contour>{inner}</contour></contours></contours_location>"
    return f"""<?xml version="1.0" encoding="utf-8"?>
<extract_about_property_land>
 <land_record>
  <object><common_data><cad_number>{cad}</cad_number></common_data></object>
  <params>
   <area><value>{area}</value></area>
   <category><type><code>{category}</code></type></category>
  </params>
  <address_location><address><readable_address>{address}</readable_address></address></address_location>
  <record_info><registration_date>{reg_date}T00:00:00</registration_date></record_info>
  {geom}
 </land_record>
</extract_about_property_land>"""


def kpzu_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "750",
    category: str = "003003000000",
    address: str = "г. Тверь, ул. Советская",
    date_created: str = "2019-02-11",
) -> str:
    """KPZU-style extract: single Parcel under the root (real_estate.py:55-56)."""
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import KPZU_NS

    geom = ""
    if rings is not None:
        geom = _spatial_xml(rings, "EntitySpatial", "SpelementUnit", "Ordinate")
    return f"""<?xml version="1.0" encoding="utf-8"?>
<KPZU xmlns="{KPZU_NS}">
 <Parcel CadastralNumber="{cad}" DateCreated="{date_created}">
  <Area><Value>{area}</Value></Area>
  <Category>{category}</Category>
  <Address><Note>{address}</Note></Address>
  {geom}
 </Parcel>
</KPZU>"""


def build_record_xml(
    cad: str,
    rings: list[np.ndarray] | None,
    area: str = "450.7",
    address: str = "Московская область, г. Истра",
    reg_date: str = "2022-03-09",
) -> str:
    """New-style building extract (real_estate.py:59-60; OCC family)."""
    geom = ""
    if rings is not None:
        inner = _spatial_xml(rings, "entity_spatial", "SpelementUnit", "Ordinate")
        geom = f"<contours_location><contours><contour>{inner}</contour></contours></contours_location>"
    return f"""<?xml version="1.0" encoding="utf-8"?>
<extract_about_property_build>
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
) -> str:
    """KVOKS/KPOKS-style capital-construction extract
    (real_estate.py:61-64): Realty wrapping a Building/Construction."""
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import KVOKS_NS

    ns = ns or KVOKS_NS
    geom = ""
    if rings is not None:
        geom = _spatial_xml(rings, "EntitySpatial", "SpelementUnit", "Ordinate")
    return f"""<?xml version="1.0" encoding="utf-8"?>
<KVOKS xmlns="{ns}">
 <Realty>
  <{kind} CadastralNumber="{cad}" DateCreated="{date_created}">
   <Area>{area}</Area>
   <Address><Note>{address}</Note></Address>
   {geom}
  </{kind}>
 </Realty>
</KVOKS>"""


def unsupported_xml() -> str:
    return '<?xml version="1.0"?><SomethingElse><x/></SomethingElse>'
