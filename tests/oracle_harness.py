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


_ARROW_TYPE_NORM = {
    # widths/encodings both engines legitimately interchange (the driver's
    # value-hash is int-width agnostic: round-1 text_tokens was hash-green
    # with spark int32 vs duckdb int64) — but decimal128 (DuckDB HUGEINT)
    # is NOT an int and does break the hash, so it is left distinct.
    "int8": "int", "int16": "int", "int32": "int", "int64": "int",
    "uint8": "int", "uint16": "int", "uint32": "int", "uint64": "int",
    "float": "float", "double": "float", "halffloat": "float",
    "large_string": "string",
    "string_view": "string",
    "large_binary": "binary",
    "timestamp[us]": "timestamp",
    "timestamp[ns]": "timestamp",
    "timestamp[us, tz=UTC]": "timestamp",
    "date32[day]": "date",
    "date64[ms]": "date",
}


def _arrow_type_key(t) -> str:
    s = str(t)
    return _ARROW_TYPE_NORM.get(s, s)


def arrow_schema_parity(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    """Driver-faithful type check: the driver value-hashes Arrow buffers, so a
    DuckDB HUGEINT (int128/decimal) vs Spark int64 mismatches even when the
    Python-normalized values are equal.  Round-1 lesson: SUM(BIGINT) in DuckDB
    returns HUGEINT — every aggregate sum in oracle SQL must be CAST AS BIGINT."""
    got = {f.name: _arrow_type_key(f.type) for f in spark_df.limit(0).toArrow().schema}
    want = {f.name: _arrow_type_key(f.type)
            for f in con.execute(f"SELECT * FROM ({sql}) LIMIT 0").fetch_arrow_table().schema}
    if got != want:
        diff = {k: (got.get(k), want.get(k))
                for k in set(got) | set(want) if got.get(k) != want.get(k)}
        return False, f"arrow type mismatch (spark, duckdb): {diff}"
    return True, "OK"


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    ok, msg = arrow_schema_parity(spark_df, con, sql)
    if not ok:
        return ok, msg
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
