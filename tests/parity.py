"""Cross-engine comparison helpers mirroring the driver's check:
row count + column names + order-insensitive value equality."""

from __future__ import annotations

import datetime
import math

import duckdb

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


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def normalize_rows(rows, colnames):
    """Sort columns by name (driver convention), normalize values,
    return a sorted list of tuples."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sres = spark_df.collect()
    scols = spark_df.columns
    dres = con.execute(sql).fetchall()
    dcols = [d[0] for d in con.description]
    if sorted(scols) != sorted(dcols):
        return False, f"column mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(sres) != len(dres):
        return False, f"row count mismatch: spark={len(sres)} duck={len(dres)}"
    a = normalize_rows([tuple(r) for r in sres], scols)
    b = normalize_rows(dres, dcols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(sres)} rows)"
