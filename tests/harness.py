"""Driver-mimic comparison harness: Spark query vs DuckDB oracle SQL.

Mirrors the driver's CORRECTNESS check: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
values canonicalized to strings with stable float formatting).
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd

TESTDATA_TABLES = ["region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings"]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    return str(v)


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_val(v) for v in row)
           for row in df[cols].itertuples(index=False, name=None)]
    return sorted(out)


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    spk = spark_df.toPandas()
    con = duckdb_conn(sf_dir)
    try:
        ora = con.execute(sql).df()
    finally:
        con.close()
    if sorted(spk.columns) != sorted(ora.columns):
        return False, f"columns {sorted(spk.columns)} vs {sorted(ora.columns)}"
    if len(spk) != len(ora):
        return False, f"rowcount {len(spk)} vs {len(ora)}"
    a, b = canon_frame(spk), canon_frame(ora)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"values differ, first diffs: {diffs}"
    return True, "ok"
