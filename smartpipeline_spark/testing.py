"""DuckDB-oracle comparison harness.

Replicates the driver's correctness gate locally: for each declared
query, run the Spark DataFrame AND the oracle SQL in DuckDB over the
same parquet tables, then compare row count, column names, and an
order-insensitive canonicalized value hash (FIXTURES.md invariant 4:
rows sorted, doubles rounded to 2 decimals, dates as YYYY-MM-DD).
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import os
from typing import Any

import duckdb

from smartpipeline_spark.sources import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 2)
        if r == int(r):
            return str(int(r))
        return f"{r:.2f}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "|".join(_canon_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    """Run both sides; return a result dict with match booleans."""
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    con = duckdb_connection(sf_dir)
    try:
        cur = con.execute(oracle_sql)
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    finally:
        con.close()
    res = {
        "spark_rows": len(srows),
        "oracle_rows": len(orows),
        "rows_match": len(srows) == len(orows),
        "spark_cols": sorted(scols),
        "oracle_cols": sorted(ocols),
        "cols_match": sorted(scols) == sorted(ocols),
    }
    res["hash_match"] = (
        res["rows_match"]
        and res["cols_match"]
        and canonical_hash(scols, srows) == canonical_hash(ocols, orows)
    )
    return res
