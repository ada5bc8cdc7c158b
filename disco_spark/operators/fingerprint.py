"""Order-independent table fingerprints — the anti-entropy checksum a
replicated store runs to prove two copies of a table are identical
WITHOUT sorting or moving rows.

Reference parity: DDFS keeps replicas of every blob and verifies them
(reference doc/overview.rst replication guarantees; SURVEY §1.3 maps
replica management to the storage layer). This operator is the table-
level version of that trust check for the modern surface: after a
migration, a backfill, or a cross-cluster copy, compare (n_rows,
xor_fp, sum_fp) per table — any row-level difference flips the
fingerprint.

Construction: each row canonicalizes to a '|'-joined string of
ENGINE-STABLE lexical forms — integers, strings, money as bigint
cents, dates as days-since-epoch — never raw double/timestamp
rendering (Java prints 1e20 as '1.0E20', DuckDB as '1e+20'; the
canonical forms sidestep the whole class). Row hash = first 15 md5 hex
chars as a 60-bit bigint; the table digest folds rows with BOTH
XOR (order/partition-independent, but blind to duplicate-pair swaps)
and a modular SUM (catches what XOR cancels). The sum accumulates in
exact DECIMAL(38,0) and is folded mod 2^63 into a BIGINT at the end:
modular addition is still commutative + associative (so the digest
stays order/partition-independent), and a BIGINT survives the
arrow/pandas hop bit-for-bit — a raw 22-digit DECIMAL(38,0) does not
(the round-9 driver-red lesson: exceed int64/float64 exactness and
the two engines' value representations diverge even when the values
are identical). Commutative + associative folds mean map-side partial
aggregation and NO shuffle of row data — at 100 TB the fingerprint
costs one scan per table and ships 3 numbers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def row_hash(canonical: Column) -> Column:
    """60-bit bigint hash of a canonical row string (md5-derived, so
    Spark and DuckDB agree; 15 hex chars keeps the cast inside a signed
    bigint on both engines)."""
    return F.conv(F.substring(F.md5(canonical), 1, 15), 16, 10).cast("bigint")


def _row_hash_sql(canonical: str) -> str:
    return f"('0x' || substr(md5({canonical}), 1, 15))::BIGINT"


def table_fingerprint(
    df: DataFrame, canonical: Column, name: str
) -> DataFrame:
    """(table_name, n_rows, xor_fp, sum_fp) — one scan, commutative
    folds only."""
    h = row_hash(canonical)
    return (
        df.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("xor_fp"),
            # exact decimal accumulation, THEN fold mod 2^63 -> bigint:
            # order-independent and representation-stable on both engines
            F.sum(F.col("h").cast("decimal(38,0)")).alias("sum_dec"),
        )
        .select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "xor_fp",
            F.expr(
                "CAST(sum_dec % CAST(9223372036854775808 AS DECIMAL(38,0))"
                " AS BIGINT)"
            ).alias("sum_fp"),
        )
    )


# canonical forms shared by the Spark and DuckDB sides; see module
# docstring for why money -> cents and dates -> day numbers
_ORDERS_CANON_SQL = (
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
    " || '|' || o_orderstatus"
    " || '|' || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)"
    " || '|' || CAST(date_diff('day', DATE '1970-01-01',"
    "                          CAST(o_orderdate AS DATE)) AS VARCHAR)"
    " || '|' || o_orderpriority"
)
_CUSTOMER_CANON_SQL = (
    "CAST(c_custkey AS VARCHAR) || '|' || c_name"
    " || '|' || CAST(c_nationkey AS VARCHAR)"
    " || '|' || CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS VARCHAR)"
    " || '|' || c_mktsegment"
)


def _orders_canon() -> Column:
    return F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("string"),
        F.col("o_orderpriority"),
    )


def _customer_canon() -> Column:
    return F.concat_ws(
        "|",
        F.col("c_custkey").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("string"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").cast("string"),
        F.col("c_mktsegment"),
    )


@query(
    "table_fingerprint_replicas",
    oracle=f"""
    SELECT 'orders' AS table_name,
           COUNT(*) AS n_rows,
           bit_xor({_row_hash_sql(_ORDERS_CANON_SQL)}) AS xor_fp,
           CAST(SUM(CAST({_row_hash_sql(_ORDERS_CANON_SQL)}
                    AS HUGEINT)) % CAST(9223372036854775808 AS HUGEINT)
                AS BIGINT) AS sum_fp
    FROM orders
    UNION ALL
    SELECT 'customer',
           COUNT(*),
           bit_xor({_row_hash_sql(_CUSTOMER_CANON_SQL)}),
           CAST(SUM(CAST({_row_hash_sql(_CUSTOMER_CANON_SQL)}
                    AS HUGEINT)) % CAST(9223372036854775808 AS HUGEINT)
                AS BIGINT)
    FROM customer
    """,
)
def table_fingerprint_replicas(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(table_name, n_rows, xor_fp, sum_fp) for orders and customer —
    the cross-engine fingerprint here doubles as the replica check:
    DuckDB reading the same parquet IS the second replica, and the
    oracle match proves the digests agree engine-to-engine."""
    t = load_tables(spark, sf_dir)
    return table_fingerprint(
        t["orders"], _orders_canon(), "orders"
    ).unionByName(
        table_fingerprint(t["customer"], _customer_canon(), "customer")
    )
