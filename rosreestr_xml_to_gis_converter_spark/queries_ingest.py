"""Driver-gate queries for the XML ingest breadth (round 2).

Each query synthesizes reference-layout extract XML DETERMINISTICALLY
from ``documents`` rows, parses it distributed (``parse_extracts``,
the real ingest path), and emits scalar columns whose values DuckDB can
recompute directly from the same base table — so the oracle checks the
whole XML synth -> namespace-correct parse -> projection chain exactly,
not just row counts.

Reference parity exercised (file:line into /root/reference):
* the full attribute set incl. DateCreatedDoc preference
  (real_estate.py:706-715), Area/Area (:813-822), CadastralCost@Value
  (:167-181), SpecialNote (:904-914), FootContent/ExtractDate (:684-695),
  State attr (:123-133), Utilization@ByDoc (:888-902);
* rights records -> normalized rights rows (:183-452);
* multi-contour land_record -> one contour row per cad_number key
  (:1612-1635).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rosreestr_xml_to_gis_converter_spark.pipeline import contours_of, rights_table
from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import parse_extracts

_N_DOCS = 300


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # measured (round 6): spreading this 300-row corpus across cores is a
    # net LOSS (~+0.15 s) — the two chained Python stages pay per-task
    # overhead that outweighs parallelizing ~0.3 s of parse work — so the
    # single-row-group scan stays as-is here, unlike the heavy operators
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < _N_DOCS)
        .select("doc_id", "n_chars")
    )


def _kvzu_corpus(docs: DataFrame) -> DataFrame:
    """documents -> (path, content) KVZU extracts, all scalar values pure
    functions of doc_id/n_chars (so DuckDB can recompute them)."""
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvzu_xml

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sq = np.array([[10.0, 50.0], [14.0, 50.0], [14.0, 54.0], [10.0, 54.0], [10.0, 50.0]])
        for pdf in it:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d = int(doc_id)
                xml = kvzu_xml(
                    f"69:10:{d // 100}:{d % 100}",
                    [sq],
                    area=str(n_chars),
                    state=f"{d % 5:02d}",
                    cadastral_cost=f"{d}.25",
                    special_note=f"note-{d}",
                    utilization_by_doc=f"use-{d % 7}",
                    date_created="2020-05-17",
                    date_created_doc="1999-12-31" if d % 3 == 0 else None,
                    rights=[
                        {
                            "code": "001002000000",
                            "owner": f"OWNER-{d}-{k}",
                            "share": (str(k + 1), str((d % 9) + 2)),
                        }
                        for k in range(d % 3 + 1)
                    ],
                )
                rows.append((f"doc-{d}.xml", xml.encode()))
            yield pd.DataFrame(rows, columns=["path", "content"])

    return docs.mapInPandas(gen, schema="path string, content binary")


def ingest_kvzu_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-attribute KVZU parse: every output value recomputable in SQL."""
    parcels = parse_extracts(_kvzu_corpus(_docs(spark, sf_dir)))
    return parcels.select(
        "cad_number",
        "area",
        "status_code",
        "category_code",
        "permitted_use_by_doc",
        "cadastral_cost",
        "special_notes",
        "extract_date",
        "date_reg",
        F.col("address_note").alias("address"),
    )


INGEST_KVZU_ATTRS_SQL = """
SELECT '69:10:' || CAST(doc_id // 100 AS VARCHAR) || ':' || CAST(doc_id % 100 AS VARCHAR) AS cad_number,
       CAST(n_chars AS VARCHAR) AS area,
       lpad(CAST(doc_id % 5 AS VARCHAR), 2, '0') AS status_code,
       '003001000000' AS category_code,
       'use-' || CAST(doc_id % 7 AS VARCHAR) AS permitted_use_by_doc,
       CAST(doc_id AS VARCHAR) || '.25' AS cadastral_cost,
       'note-' || CAST(doc_id AS VARCHAR) AS special_notes,
       '15.06.2023' AS extract_date,
       CASE WHEN doc_id % 3 = 0 THEN '31.12.1999' ELSE '17.05.2020' END AS date_reg,
       'обл. Тверская, р-н Калининский' AS address
FROM documents WHERE doc_id < 300
"""


def ingest_rights_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML rights records -> normalized rights rows (the owner-matrix
    input), values recomputable in SQL."""
    parcels = parse_extracts(_kvzu_corpus(_docs(spark, sf_dir)))
    return rights_table(parcels).select(
        F.regexp_extract("doc_id", r"doc-(\d+)\.xml", 1).cast("long").alias("doc_id"),
        "right_type",
        "owner",
        "share_num",
        "share_den",
        "share_text",
    )


INGEST_RIGHTS_SQL = """
SELECT doc_id,
       'Долевая собственность' AS right_type,
       'OWNER-' || CAST(doc_id AS VARCHAR) || '-' || CAST(k AS VARCHAR) AS owner,
       CAST(k + 1 AS VARCHAR) AS share_num,
       CAST(doc_id % 9 + 2 AS INT) AS share_den,
       CAST(k + 1 AS VARCHAR) || '/' || CAST(doc_id % 9 + 2 AS VARCHAR) AS share_text
FROM documents, unnest(range(0, doc_id % 3 + 1)) AS t(k)
WHERE doc_id < 300
"""


def ingest_multi_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-contour land_record extracts -> one row per contour key
    (real_estate.py:1612-1635); keys recomputable in SQL."""
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import land_record_xml

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                cad = f"50:0:{d}"
                n_cont = d % 3 + 1
                xml = land_record_xml(
                    cad,
                    None,
                    area=str(d * 10),
                    contours={f"{cad}({i + 1})": [sq + 10.0 * i] for i in range(n_cont)},
                )
                rows.append((f"lr-{d}.xml", xml.encode()))
            yield pd.DataFrame(rows, columns=["path", "content"])

    files = _docs(spark, sf_dir).mapInPandas(gen, schema="path string, content binary")
    ct = contours_of(parse_extracts(files))
    return ct.select(
        "geom_key",
        "parent_cad_number",
        F.isnotnull("geom").alias("has_geom"),
    )


INGEST_MULTI_CONTOUR_SQL = """
SELECT '50:0:' || CAST(doc_id AS VARCHAR) || '(' || CAST(k + 1 AS VARCHAR) || ')' AS geom_key,
       '50:0:' || CAST(doc_id AS VARCHAR) AS parent_cad_number,
       TRUE AS has_geom
FROM documents, unnest(range(0, doc_id % 3 + 1)) AS t(k)
WHERE doc_id < 300
"""


def ingest_owner_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Owner matrix + rights string columns driven END-TO-END from XML:
    synth extracts (1-3 shared-ownership rights per doc) -> parse ->
    finalize -> owner_summary / with_rights_strings; every output string
    recomputable in SQL from the generative formula."""
    from rosreestr_xml_to_gis_converter_spark.operators.attrs import (
        owner_summary,
        with_rights_strings,
    )
    from rosreestr_xml_to_gis_converter_spark.pipeline import (
        finalize_attributes,
        rights_table,
    )

    parcels = finalize_attributes(parse_extracts(_kvzu_corpus(_docs(spark, sf_dir))))
    p = with_rights_strings(parcels)
    own = owner_summary(
        rights_table(p), p.select("doc_id", "category", "district_name")
    )
    return (
        p.join(own, "doc_id")
        .select(
            F.regexp_extract("doc_id", r"doc-(\d+)\.xml", 1).cast("long").alias("doc_id"),
            "owner",
            "own_name_reg_numb_date",
            "encumbrances_str",
            "enc_name_reg_numb_date_duration",
        )
    )


# owners are 'OWNER-{d}-{k}' (initcap -> 'Owner-{d}-{k}'), all rights are
# shared ownership with share text '{k+1}/{d%9+2}'; the matrix branches on
# owner count d%3+1 (operators/attrs.py <- real_estate.py:381-452):
# 1 owner -> B1 'type owner' with the RAW (uppercase) name — cell_owner[0]
# is built from the unmodified string (:383-386); 2 owners with 2 numeric
# shares -> B3e 'type: d1 N1, d2 N2' (initcap'd); 3 owners -> B3c count
INGEST_OWNER_STRINGS_SQL = """
SELECT doc_id,
       CASE doc_id % 3
         WHEN 0 THEN 'Долевая собственность OWNER-' || CAST(doc_id AS VARCHAR) || '-0'
         WHEN 1 THEN 'Долевая собственность: '
                     || '1/' || CAST(doc_id % 9 + 2 AS VARCHAR)
                     || ' Owner-' || CAST(doc_id AS VARCHAR) || '-0, '
                     || '2/' || CAST(doc_id % 9 + 2 AS VARCHAR)
                     || ' Owner-' || CAST(doc_id AS VARCHAR) || '-1'
         ELSE 'Долевая собственность (' || CAST(doc_id % 9 + 2 AS VARCHAR)
              || ' долей; 3 правообладателей)'
       END AS owner,
       -- KVZU I: modern Registration/Name texts ONLY (the corpus rights
       -- carry none) -> '' (real_estate.py:453-497; round 4 removed the
       -- synthesized bare-type entries)
       '' AS own_name_reg_numb_date,
       '' AS encumbrances_str,
       -- KVZU K: '' when no Duration-bearing encumbrances (:682)
       '' AS enc_name_reg_numb_date_duration
FROM documents WHERE doc_id < 300
"""


def ingest_rename_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 rename (main.py:177-225) end-to-end from XML: colliding
    cadastral numbers get the reference's ' (2)'..' (n)' suffixes; the
    derived names are recomputable in SQL."""
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvzu_xml

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
        for pdf in it:
            rows = [
                (f"doc-{int(d)}.xml", kvzu_xml(f"69:77:0:{int(d) % 50}", [sq]).encode())
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["path", "content"])

    from rosreestr_xml_to_gis_converter_spark.pipeline import rename_plan

    files = _docs(spark, sf_dir).mapInPandas(gen, schema="path string, content binary")
    parcels = parse_extracts(files).withColumn(
        "_ord", F.regexp_extract("doc_id", r"doc-(\d+)\.xml", 1).cast("long")
    )
    out = rename_plan(parcels, "_ord")
    return out.select(
        F.regexp_extract("path", r"doc-(\d+)\.xml", 1).cast("long").alias("doc_id"),
        "new_name",
    )


INGEST_RENAME_SQL = """
SELECT doc_id,
       '69-77-0-' || CAST(doc_id % 50 AS VARCHAR) || '---15-06-2023'
       || CASE WHEN rn = 1 THEN '' ELSE ' (' || CAST(rn AS VARCHAR) || ')' END
       || '.xml' AS new_name
FROM (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id % 50 ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id < 300
)
"""


def ingest_occ_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCC long-address concatenation END-TO-END (real_estate.py:1721-1753):
    KVOKS extracts with deterministic District/City/Street/Level1/Apartment
    part combinations -> parse -> finalize_attributes; the ordered
    ', '-joined address (region classifier label first) plus the OCC
    category/status stubs are recomputed exactly in SQL."""
    from rosreestr_xml_to_gis_converter_spark.pipeline import finalize_attributes
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvoks_xml

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d = int(doc_id)
                parts = [f"<adrs:Region>{'69' if d % 2 == 0 else '50'}</adrs:Region>"]
                if d % 2 == 0:
                    parts.append(f'<adrs:District Name="Р-{d}" Type="р-н"/>')
                if d % 3 == 0:
                    parts.append(f'<adrs:City Type="г" Name="Город-{d}"/>')
                if d % 4 == 0:
                    parts.append(f'<adrs:Street Name="Улица-{d}" Type="ул"/>')
                if d % 5 == 0:
                    parts.append(f'<adrs:Level1 Type="д" Value="{d % 50}"/>')
                if d % 7 == 0:
                    parts.append(f'<adrs:Apartment Type="кв" Value="{d % 20}"/>')
                xml = kvoks_xml(
                    f"69:40:{d}:1", None, area=str(n_chars), address="x"
                ).replace("<adrs:Note>x</adrs:Note>", "".join(parts))
                rows.append((f"occ-{d}.xml", xml.encode()))
            yield pd.DataFrame(rows, columns=["path", "content"])

    files = _docs(spark, sf_dir).mapInPandas(gen, schema="path string, content binary")
    out = finalize_attributes(parse_extracts(files))
    return out.select(
        F.regexp_extract("doc_id", r"occ-(\d+)\.xml", 1).cast("long").alias("doc_id"),
        "cad_number",
        "address",
        "area",
        "category",
        "status",
    )


def _occ_address_sql() -> str:
    from rosreestr_xml_to_gis_converter_spark.classifiers import REGION

    return f"""
SELECT doc_id,
       '69:40:' || CAST(doc_id AS VARCHAR) || ':1' AS cad_number,
       CASE WHEN doc_id % 2 = 0 THEN '{REGION["69"]}' ELSE '{REGION["50"]}' END
       || CASE WHEN doc_id % 2 = 0 THEN ', Р-' || CAST(doc_id AS VARCHAR) || ' р-н' ELSE '' END
       || CASE WHEN doc_id % 3 = 0 THEN ', г Город-' || CAST(doc_id AS VARCHAR) ELSE '' END
       || CASE WHEN doc_id % 4 = 0 THEN ', Улица-' || CAST(doc_id AS VARCHAR) || ' ул' ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN ', д ' || CAST(doc_id % 50 AS VARCHAR) ELSE '' END
       || CASE WHEN doc_id % 7 = 0 THEN ', кв ' || CAST(doc_id % 20 AS VARCHAR) ELSE '' END
       AS address,
       CAST(n_chars AS VARCHAR) AS area,
       '-' AS category,
       '-' AS status
FROM documents WHERE doc_id < {_N_DOCS}
"""


INGEST_OCC_ADDRESS_SQL = _occ_address_sql()


def ingest_zip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 end-to-end: two-level ZIP archives (outer zip holding a nested
    inner zip, a level-1 XML, and a .sig companion) -> distributed
    extract_zip_contents (.sig dropped, nested members surfaced) ->
    parse_extracts; member provenance and cadastral numbers are
    recomputable in SQL (mirrors logic.py:83-93, main.py:149-175)."""
    import io
    import zipfile

    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvzu_xml
    from rosreestr_xml_to_gis_converter_spark.sources.xml_extract import (
        extract_zip_contents,
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                inner_buf = io.BytesIO()
                with zipfile.ZipFile(inner_buf, "w") as zi:
                    zi.writestr(f"doc-{d}-a.xml", kvzu_xml(f"50:10:{d}:1", [sq]))
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as zo:
                    zo.writestr("inner.zip", inner_buf.getvalue())
                    zo.writestr(f"doc-{d}-b.xml", kvzu_xml(f"50:20:{d}:2", [sq]))
                    zo.writestr(f"doc-{d}-b.xml.sig", b"signature-bytes")
                rows.append((f"arch-{d}.zip", buf.getvalue()))
            yield pd.DataFrame(rows, columns=["path", "content"])

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )
    files = extract_zip_contents(docs.mapInPandas(gen, schema="path string, content binary"))
    parsed = parse_extracts(files)
    return parsed.select(
        F.regexp_extract("doc_id", r"arch-(\d+)\.zip", 1).cast("long").alias("doc_id"),
        F.regexp_extract("doc_id", r"-(a|b)\.xml$", 1).alias("member"),
        (F.regexp_extract("doc_id", r"!inner\.zip!", 0) != "").alias("nested"),
        "cad_number",
    )


INGEST_ZIP_EXTRACT_SQL = """
SELECT doc_id, m AS member, m = 'a' AS nested,
       CASE WHEN m = 'a' THEN '50:10:' || CAST(doc_id AS VARCHAR) || ':1'
            ELSE '50:20:' || CAST(doc_id AS VARCHAR) || ':2' END AS cad_number
FROM documents, unnest(['a', 'b']) AS t(m)
WHERE doc_id < 200
"""


def ingest_egrn_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EGRN owner tree END-TO-END (real_estate.py:1076-1239):
    land_record extracts -> parse -> rights_table -> owner_summary;
    doc_id % 7 spreads docs over the single-holder, two-record,
    >2-record (no-space-paren quirk) and no-share SHARED branches PLUS
    the cells_owners paths (:1208-1219): v4 mixes a shared record with a
    non-shared one (length mismatch -> 'last_type holder'), v5 pairs two
    non-shared records POSITIONALLY in document order (types chosen so a
    sort would reorder them), v6 plants an 'Иной субъект права' holder —
    the reference appends nothing for it (:1206-1207), so the pairing
    shifts into the mismatch branch.  Every owner string recomputable in
    SQL."""
    from rosreestr_xml_to_gis_converter_spark.operators.attrs import owner_summary
    from rosreestr_xml_to_gis_converter_spark.pipeline import rights_table
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import (
        egrn_right_records,
        land_record_xml,
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
        eg = "Общая долевая собственность"
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                den = d % 7 + 2
                v = d % 7
                if v == 0:
                    recs = [
                        {"type": eg, "share": ("1", str(den)),
                         "holders": [("individual", f"Egrnov-{d}-0 Ivan")]},
                    ]
                elif v == 1:
                    recs = [
                        {"type": eg, "share": (str(k + 1), str(den)),
                         "holders": [("individual", f"Egrnov-{d}-{k} Ivan")]}
                        for k in range(2)
                    ]
                elif v == 2:
                    recs = [
                        {"type": eg, "share": (str(k + 1), str(den)),
                         "holders": [("individual", f"Egrnov-{d}-{k} Ivan")]}
                        for k in range(3)
                    ]
                elif v == 3:
                    recs = [
                        {"type": eg, "holders": [("municipality", f"Mun-{d}-{k}")]}
                        for k in range(2)
                    ]
                elif v == 4:
                    # MIXED shared + non-shared: r_type_list has 2 entries,
                    # lst_holders 1 -> mismatch -> 'last_type holder'
                    recs = [
                        {"type": eg, "share": ("1", str(den)),
                         "holders": [("individual", f"Egrnov-{d}-0 Ivan")]},
                        {"type": "Собственность",
                         "holders": [("individual", f"Sobstv-{d} Ivan")]},
                    ]
                elif v == 5:
                    # two non-shared records -> POSITIONAL pairing in
                    # document order ('Собственность' sorts after
                    # 'Аренда', so a sorted join would swap them)
                    recs = [
                        {"type": "Собственность",
                         "holders": [("individual", f"Zeta-{d} Ivan")]},
                        {"type": "Аренда",
                         "holders": [("municipality", f"Alpha-{d}")]},
                    ]
                else:
                    # the 'another' holder kind appends NOTHING
                    # (real_estate.py:1206-1207): 2 typed records but only
                    # 1 holder -> the pairing shifts to the mismatch cell
                    recs = [
                        {"type": "Собственность", "holders": [("another", "")]},
                        {"type": "Аренда",
                         "holders": [("individual", f"Rent-{d} Ivan")]},
                    ]
                xml = land_record_xml(
                    f"50:9:{d}", [sq], right_records=egrn_right_records(recs)
                )
                rows.append((f"eg-{d}.xml", xml.encode()))
            yield pd.DataFrame(rows, columns=["path", "content"])

    files = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).mapInPandas(
        gen, schema="path string, content binary"
    )
    parcels = parse_extracts(files)
    own = owner_summary(
        rights_table(parcels),
        parcels.select("doc_id", F.lit("Прочее").alias("category"),
                       F.lit("Калининский").alias("district_name")),
    )
    return own.select(
        F.regexp_extract("doc_id", r"eg-(\d+)\.xml", 1).cast("long").alias("doc_id"),
        "owner",
    )


INGEST_EGRN_OWNER_SQL = """
SELECT doc_id,
  CASE doc_id % 7
    WHEN 0 THEN 'Общая долевая собственность: 1/' || CAST(doc_id % 7 + 2 AS VARCHAR)
                || ' Egrnov-' || CAST(doc_id AS VARCHAR) || '-0 Ivan'
    WHEN 1 THEN 'Общая долевая собственность: '
                || '1/' || CAST(doc_id % 7 + 2 AS VARCHAR)
                || ' Egrnov-' || CAST(doc_id AS VARCHAR) || '-0 Ivan, '
                || '2/' || CAST(doc_id % 7 + 2 AS VARCHAR)
                || ' Egrnov-' || CAST(doc_id AS VARCHAR) || '-1 Ivan'
    WHEN 2 THEN 'Общая долевая собственность(' || CAST(doc_id % 7 + 2 AS VARCHAR)
                || ' долей; 3 правообладателей)'
    WHEN 3 THEN 'Общая долевая собственность: Mun-' || CAST(doc_id AS VARCHAR)
                || '-0, Mun-' || CAST(doc_id AS VARCHAR) || '-1'
    WHEN 4 THEN 'Собственность Sobstv-' || CAST(doc_id AS VARCHAR) || ' Ivan'
    WHEN 5 THEN 'Собственность Zeta-' || CAST(doc_id AS VARCHAR)
                || ' Ivan, Аренда Alpha-' || CAST(doc_id AS VARCHAR)
    ELSE 'Аренда Rent-' || CAST(doc_id AS VARCHAR) || ' Ivan'
  END AS owner
FROM documents WHERE doc_id < 200
"""


def ingest_error_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 end-to-end: a corpus mixing malformed XML, valid-but-unsupported
    schemas, and good extracts -> parse_extracts; every failure must land
    in the error bucket with its class (never fail the task —
    main.py:33-49 log-and-continue), every good doc must parse.  Error
    classes and row mix recomputable in SQL."""
    from rosreestr_xml_to_gis_converter_spark.sources.synth_xml import kvzu_xml

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sq = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 3 == 0:
                    content = b"<Parcels><broken "  # malformed
                elif d % 3 == 1:
                    content = b'<?xml version="1.0"?><SomethingElse><x/></SomethingElse>'
                else:
                    content = kvzu_xml(f"50:30:{d}:3", [sq]).encode()
                rows.append((f"q-{d}.xml", content))
            yield pd.DataFrame(rows, columns=["path", "content"])

    files = _docs(spark, sf_dir).filter(F.col("doc_id") < 200).mapInPandas(
        gen, schema="path string, content binary"
    )
    parsed = parse_extracts(files)
    return parsed.select(
        F.regexp_extract("doc_id", r"q-(\d+)\.xml", 1).cast("long").alias("doc_id"),
        F.when(F.col("error").startswith("parse_error"), "parse_error")
        .when(F.col("error").isNotNull(), F.col("error"))
        .otherwise("ok")
        .alias("err_class"),
        "cad_number",
    )


INGEST_ERROR_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'parse_error'
            WHEN 1 THEN 'unsupported_schema' ELSE 'ok' END AS err_class,
       CASE WHEN doc_id % 3 = 2
            THEN '50:30:' || CAST(doc_id AS VARCHAR) || ':3' END AS cad_number
FROM documents WHERE doc_id < 200
"""


_XLSX_COLS = [
    "cad_number", "parent_cad_number", "area", "address", "status",
    "category", "permitted_use", "owner", "own_name_reg_numb_date",
    "encumbrances_str", "enc_name_reg_numb_date_duration", "special",
    "date_reg", "extract_date", "estate_objects_str", "cadastral_cost",
    "obj_type",
]


def ingest_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 end-to-end: XML corpus -> parse -> finalize -> XLSX export
    (pure-python OOXML writer, main.py:416-454 layout) -> re-read the
    workbook -> every attribute cell recomputed exactly in SQL.  The
    export is the reference's final mile (driver-side stream); the
    re-read proves the written workbook, not just the DataFrame."""
    import os
    import tempfile

    from rosreestr_xml_to_gis_converter_spark.pipeline import export_outputs
    from rosreestr_xml_to_gis_converter_spark.sinks.xlsx import read_xlsx_rows

    import shutil

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 150)
    parcels = parse_extracts(_kvzu_corpus(docs))
    out_dir = tempfile.mkdtemp(prefix="gate_export_")
    try:
        export_outputs(parcels, out_dir)
        rows = read_xlsx_rows(os.path.join(out_dir, "real_estate_objects_EGRN.xlsx"))[1:]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    pdf = pd.DataFrame(rows, columns=_XLSX_COLS)
    sdf = spark.createDataFrame(
        pdf[
            [
                "cad_number", "area", "status", "permitted_use", "special",
                "date_reg", "extract_date", "cadastral_cost", "owner",
            ]
        ].astype(str)
    )
    return sdf.withColumn(
        "doc_id",
        (
            F.split("cad_number", ":")[2].cast("long") * 100
            + F.split("cad_number", ":")[3].cast("long")
        ),
    )


# the corpus state code is d%5 zero-padded; only '01' exists in the STATUS
# classifier (01/05/06/07/08), everything else falls to the '-' default
INGEST_EXPORT_SQL = """
SELECT '69:10:' || CAST(doc_id // 100 AS VARCHAR) || ':' || CAST(doc_id % 100 AS VARCHAR) AS cad_number,
       CAST(n_chars AS VARCHAR) AS area,
       CASE WHEN doc_id % 5 = 1 THEN 'Ранее учтенный' ELSE '-' END AS status,
       'use-' || CAST(doc_id % 7 AS VARCHAR) AS permitted_use,
       'note-' || CAST(doc_id AS VARCHAR) AS special,
       CASE WHEN doc_id % 3 = 0 THEN '31.12.1999' ELSE '17.05.2020' END AS date_reg,
       '15.06.2023' AS extract_date,
       CAST(doc_id AS VARCHAR) || '.25' AS cadastral_cost,
       CASE doc_id % 3
         WHEN 0 THEN 'Долевая собственность OWNER-' || CAST(doc_id AS VARCHAR) || '-0'
         WHEN 1 THEN 'Долевая собственность: '
                     || '1/' || CAST(doc_id % 9 + 2 AS VARCHAR)
                     || ' Owner-' || CAST(doc_id AS VARCHAR) || '-0, '
                     || '2/' || CAST(doc_id % 9 + 2 AS VARCHAR)
                     || ' Owner-' || CAST(doc_id AS VARCHAR) || '-1'
         ELSE 'Долевая собственность (' || CAST(doc_id % 9 + 2 AS VARCHAR)
              || ' долей; 3 правообладателей)'
       END AS owner,
       doc_id
FROM documents WHERE doc_id < 150
"""


def ingest_shp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 end-to-end: XML corpus -> parse -> ESRI Shapefile export
    (pure-python writer, main.py:379-414 layout) -> re-read the .shp/.dbf
    -> cadastral key split, DBF attributes, and the geometry doubles
    (ring vertex count + coordinate sums, orientation-invariant) all
    recomputed exactly in SQL."""
    import os
    import tempfile

    from rosreestr_xml_to_gis_converter_spark.pipeline import export_outputs
    from rosreestr_xml_to_gis_converter_spark.sinks import read_shapefile

    import shutil

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 150)
    parcels = parse_extracts(_kvzu_corpus(docs))
    out_dir = tempfile.mkdtemp(prefix="gate_shp_")
    try:
        export_outputs(parcels, out_dir)
        recs = read_shapefile(os.path.join(out_dir, "real_estate_objects_EGRN"))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    rows = []
    for rings, attrs in recs:
        cad, parent, num_of_cont = attrs[0], attrs[1], attrs[2]
        area, status, date_reg = attrs[3], attrs[5], attrs[13]
        rows.append(
            (
                cad, parent, num_of_cont, float(area), status, str(date_reg),
                len(rings), int(sum(len(r) for r in rings)),
                float(sum(float(x) for r in rings for x, _ in r)),
                float(sum(float(y) for r in rings for _, y in r)),
            )
        )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "cad_number", "parent_cad_number", "num_of_cont", "area", "status",
            "date_reg", "n_rings", "n_pts", "sx", "sy",
        ],
    )
    sdf = spark.createDataFrame(pdf)
    return sdf.withColumn(
        "doc_id",
        (
            F.split("cad_number", ":")[2].cast("long") * 100
            + F.split("cad_number", ":")[3].cast("long")
        ),
    )


# the corpus square ring [[10,50],[14,50],[14,54],[10,54],[10,50]] has
# coordinate sums 58/258 regardless of the orientation normalization;
# the DBF 'D' field reads back as yyyymmdd text
INGEST_SHP_SQL = """
SELECT '69:10:' || CAST(doc_id // 100 AS VARCHAR) || ':' || CAST(doc_id % 100 AS VARCHAR) AS cad_number,
       '' AS parent_cad_number,
       '' AS num_of_cont,
       CAST(n_chars AS DOUBLE) AS area,
       CASE WHEN doc_id % 5 = 1 THEN 'Ранее учтенный' ELSE '-' END AS status,
       CASE WHEN doc_id % 3 = 0 THEN '19991231' ELSE '20200517' END AS date_reg,
       CAST(1 AS BIGINT) AS n_rings, CAST(5 AS BIGINT) AS n_pts,
       CAST(58.0 AS DOUBLE) AS sx, CAST(258.0 AS DOUBLE) AS sy,
       doc_id
FROM documents WHERE doc_id < 150
"""


INGEST_QUERIES = {
    "ingest_rename_plan": ingest_rename_plan,
    "ingest_kvzu_attrs": ingest_kvzu_attrs,
    "ingest_rights_rows": ingest_rights_rows,
    "ingest_multi_contour": ingest_multi_contour,
    "ingest_owner_strings": ingest_owner_strings,
    "ingest_occ_address": ingest_occ_address,
    "ingest_zip_extract": ingest_zip_extract,
    "ingest_export_roundtrip": ingest_export_roundtrip,
    "ingest_shp_roundtrip": ingest_shp_roundtrip,
    "ingest_egrn_owner": ingest_egrn_owner,
    "ingest_error_quarantine": ingest_error_quarantine,
}

INGEST_ORACLES = {
    "ingest_egrn_owner": INGEST_EGRN_OWNER_SQL,
    "ingest_error_quarantine": INGEST_ERROR_SQL,
    "ingest_export_roundtrip": INGEST_EXPORT_SQL,
    "ingest_shp_roundtrip": INGEST_SHP_SQL,
    "ingest_occ_address": INGEST_OCC_ADDRESS_SQL,
    "ingest_zip_extract": INGEST_ZIP_EXTRACT_SQL,
    "ingest_rename_plan": INGEST_RENAME_SQL,
    "ingest_owner_strings": INGEST_OWNER_STRINGS_SQL,
    "ingest_kvzu_attrs": INGEST_KVZU_ATTRS_SQL,
    "ingest_rights_rows": INGEST_RIGHTS_SQL,
    "ingest_multi_contour": INGEST_MULTI_CONTOUR_SQL,
}
