"""DuckDB-oracle comparison harness, mirroring the driver's gate:
row-count + schema (column names) + order-insensitive value hash.

Used by tests/ to validate every registered query at sf0.001/sf0.01
before the driver runs the real gate.

The driver's value hash is DTYPE-SENSITIVE (round-1 lesson: DuckDB
widens SUM(BIGINT) to HUGEINT, Spark emits bigint, and the identical
values still hash-mismatched). So this harness:
  * maps every DuckDB output type to its Spark equivalent and asserts
    a 1:1 match against the Spark schema (HUGEINT is rejected outright
    with a pointer to the CAST fix);
  * compares floats EXACTLY (bit-level via float.hex), not rounded —
    all oracle-checked doubles derive from DECIMAL(20,6) accumulation
    or identical IEEE754 expressions, so exact equality is the bar the
    driver actually enforces.
"""

from __future__ import annotations

import math
import os
import re
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


# ---------------------------------------------------------------------------
# dtype parity: DuckDB DESCRIBE type string -> Spark simpleString type
# ---------------------------------------------------------------------------
# Integer WIDTHS are interchangeable: the driver's hash compares values
# whose repr is width-independent (round-1 evidence: spark int ntile vs
# DuckDB BIGINT passed). What breaks it is a conversion that changes the
# VALUE repr — DuckDB HUGEINT becomes float64 through pandas/arrow.
_INTS = {"bigint", "int", "smallint", "tinyint"}
_DUCK_SCALAR = {
    "BIGINT": _INTS,
    "INTEGER": _INTS,
    "SMALLINT": _INTS,
    "TINYINT": _INTS,
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "BLOB": "binary",
}
# Spark timestamp vs timestamp_ntz are both acceptable for any DuckDB
# timestamp flavor (tests load tables tz-naive on both sides).
_DUCK_TS = re.compile(r"^TIMESTAMP( WITH TIME ZONE|_NS|_MS|_S)?$")
_DUCK_DEC = re.compile(r"^DECIMAL\((\d+),(\d+)\)$")


def duck_type_to_spark(duck: str) -> str | set[str]:
    """Spark type(s) a DuckDB output type may legitimately pair with.

    Raises on types Spark cannot emit (HUGEINT et al.) — those always
    hash-mismatch at the driver even when values are equal.
    """
    duck = duck.strip()
    if duck in ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"):
        raise AssertionError(
            f"oracle emits {duck}, which Spark cannot produce — wrap the "
            f"offending expression (usually SUM over an integer column) in "
            f"CAST(... AS BIGINT) in the oracle SQL"
        )
    if duck in _DUCK_SCALAR:
        return _DUCK_SCALAR[duck]
    if _DUCK_TS.match(duck):
        return {"timestamp", "timestamp_ntz"}
    m = _DUCK_DEC.match(duck)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if duck.endswith("[]"):
        inner = duck_type_to_spark(duck[:-2])
        inner = sorted(inner) if isinstance(inner, set) else [inner]
        return {f"array<{i}>" for i in inner}
    raise AssertionError(f"unmapped DuckDB type in oracle output: {duck!r}")


def assert_dtype_parity(name: str, spark_dtypes: list[tuple], duck_schema: list[tuple]) -> None:
    """spark_dtypes: df.dtypes; duck_schema: [(col, ducktype), ...]."""
    sp = dict(spark_dtypes)
    for col, ducktype in duck_schema:
        if col not in sp:
            continue  # column-name mismatch is reported separately
        allowed = duck_type_to_spark(ducktype)
        if isinstance(allowed, str):
            allowed = {allowed}
        assert sp[col] in allowed, (
            f"{name}: dtype mismatch on {col!r}: spark={sp[col]} "
            f"duck={ducktype} (allowed: {sorted(allowed)}) — the driver's "
            f"value hash is dtype-sensitive; align both sides"
        )


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
        # exact: the driver hashes raw values, so last-bit noise FAILS
        # there — surface it here too (see module docstring)
        return v.hex()
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

    if name not in QUERIES:
        # registration is an import side-effect; tests that only import
        # helpers (or nothing) would otherwise KeyError here depending
        # on which test file ran first
        from disco_spark.registry import load_all

        load_all()
    fn = QUERIES[name]
    df = fn(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    if name not in ORACLES:  # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return

    con = duckdb_connect(sf_dir)
    duck_schema = [
        (r[0], r[1]) for r in con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    ]
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert_dtype_parity(name, df.dtypes, duck_schema)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount mismatch spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = rows_to_multiset(spark_cols, spark_rows)
    b = rows_to_multiset(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
