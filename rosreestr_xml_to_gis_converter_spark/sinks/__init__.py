"""Final-mile export sinks (K1 shapefile / K2 XLSX).

The ENGINE sink is parquet/Iceberg tables (sources/catalog.py) — right
for 100 TB.  These modules close the reference's end-to-end purpose
("view the layer in a GIS", /root/reference/README.md): small driver-side
export jobs that stream the finished output tables into an ESRI
Shapefile (main.py:322-342) and an XLSX workbook (main.py:250-321).
Pure-python writers — the formats are public specifications; pyshp /
openpyxl are not available in this environment.
"""

from rosreestr_xml_to_gis_converter_spark.sinks.shapefile import (  # noqa: F401
    read_shapefile,
    write_shapefile,
)
from rosreestr_xml_to_gis_converter_spark.sinks.xlsx import write_xlsx  # noqa: F401
