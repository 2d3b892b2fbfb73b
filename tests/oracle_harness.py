"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its DuckDB oracle on the same parquet tables and
compares row multisets exactly (floats bitwise — stricter than any
value-hash the driver could use).
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v
    return v


def to_multiset(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    got = spark_df.toPandas()
    want = con.execute(sql).fetchdf()
    gc, gr = to_multiset(got)
    wc, wr = to_multiset(want)
    if gc != wc:
        return False, f"column mismatch: spark={gc} duckdb={wc}"
    if len(gr) != len(wr):
        return False, f"row count mismatch: spark={len(gr)} duckdb={len(wr)}"
    for i, (a, b) in enumerate(zip(gr, wr)):
        if a != b:
            return False, f"first differing row {i}: spark={a!r} duckdb={b!r}"
    return True, f"OK ({len(gr)} rows)"
