"""Z-order (Morton-curve) clustered writes: multi-dimensional data
layout for min-max scan pruning (beyond-reference surface; the
reference has no layout control at all — DDFS placement is
replication-driven, config.erl/ddfs_tag paths).

Why this matters at 100 TB: a parquet scan prunes files and row groups
whose column min/max stats exclude the predicate. Sorting by ONE column
gives perfect pruning on that column and none on any other; writing in
arrival order gives none on either. Interleaving the bits of two
bounded column ranks (the Morton / Z curve) makes every contiguous key
range — and therefore every written file — cover a small RECTANGLE of
the 2-d value space, so a conjunctive box predicate (customer range AND
date range) skips all files whose rectangle misses the box. The layout
pass is one extra range-shuffle at write time; every subsequent scan
pays less.

Plan shape:
- one bounded agg action collects the 4 scale anchors (min/max per dim);
- rank scaling and bit interleaving are pure integer JVM expressions
  (exact, engine-independent — the DuckDB oracle replays them);
- `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)` produce
  files that tile the curve; Spark samples range boundaries, so files
  are balanced even when the curve's population is skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables

Z_BITS = 16  # per-dimension rank resolution; zkey fits in 32 bits


def rank_expr(col_name: str, mn: int, mx: int, bits: int = Z_BITS) -> Column:
    """Scale an integer column with observed range [mn, mx] to an
    integer rank in [0, 2^bits): ((v - mn) * 2^bits) div span. The
    `div` keeps it exact bigint end-to-end; the max value maps to
    ((span-1) * 2^bits) div span < 2^bits, so no clamp is needed and
    both engines agree bit-for-bit."""
    span = int(mx) - int(mn) + 1
    return F.expr(
        f"((cast(`{col_name}` as bigint) - {int(mn)}L)"
        f" * {1 << bits}L) div {span}L"
    )


def zorder_key_n(ranks: list[Column], bits: int = Z_BITS) -> Column:
    """Round-robin bit interleave of D ranks: bit i of rank d lands at
    position i*D + d. D*bits constant shift/mask terms OR-folded — all
    JVM integer ops inside whole-stage codegen; no UDF, no shuffle.
    D*bits must fit a signed 64-bit key (e.g. 3 dims x 16 bits = 48)."""
    d = len(ranks)
    if not (1 <= d and d * bits <= 63):
        raise ValueError(f"{d} dims x {bits} bits won't fit a signed long key")
    z: Column | None = None
    for i in range(bits):
        for j, r in enumerate(ranks):
            t = F.shiftleft(F.shiftright(r, i).bitwiseAND(F.lit(1)), i * d + j)
            z = t if z is None else z.bitwiseOR(t)
    assert z is not None
    return z


def zorder_key(a_rank: Column, b_rank: Column, bits: int = Z_BITS) -> Column:
    """Interleave the bits of two ranks (a gets even positions, b odd) —
    the 2-d case of zorder_key_n, kept for the oracle-checked query."""
    return zorder_key_n([a_rank, b_rank], bits)


def zorder_write(
    df: DataFrame,
    dims: "tuple[str, ...] | list[str]",
    path: str,
    n_files: int,
    bits: int = Z_BITS,
) -> None:
    """Write `df` as parquet clustered on the Z curve of D integer
    dimension columns (D*bits must fit a long key). One bounded action
    (2D scalars) anchors the rank scaling; the data itself moves once
    through a range shuffle."""
    anchors = df.agg(
        *[f for c in dims for f in (F.min(c), F.max(c))]
    ).first()
    if any(v is None for v in anchors):  # empty input: nothing to cluster
        df.write.mode("overwrite").parquet(path)
        return
    zkey = zorder_key_n(
        [
            rank_expr(c, anchors[2 * i], anchors[2 * i + 1], bits)
            for i, c in enumerate(dims)
        ],
        bits,
    )
    (
        df.withColumn("__zkey", zkey)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def _zkey_sql(a_rank: str, b_rank: str, bits: int = Z_BITS) -> str:
    """The same interleave as zorder_key, rendered for DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_rank}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({b_rank}) >> {i}) & 1) << {2 * i + 1}")
    return " | ".join(f"({t})" for t in terms)


_EPOCH = "1992-01-01"  # TPC-H date floor; testdata dates are 1992-1998


@query(
    "zorder_orders_key",
    oracle=f"""
    WITH days AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', DATE '{_EPOCH}', o_orderdate) AS d
      FROM orders
    ),
    anchors AS (
      SELECT MIN(o_custkey) AS lo_a, MAX(o_custkey) AS hi_a,
             MIN(d) AS lo_b, MAX(d) AS hi_b
      FROM days
    ),
    ranked AS (
      SELECT o_orderkey,
             ((CAST(o_custkey AS BIGINT) - lo_a) * {1 << Z_BITS})
               // (hi_a - lo_a + 1) AS ra,
             ((CAST(d AS BIGINT) - lo_b) * {1 << Z_BITS})
               // (hi_b - lo_b + 1) AS rb
      FROM days, anchors
    )
    SELECT o_orderkey, CAST({_zkey_sql("ra", "rb")} AS BIGINT) AS zkey
    FROM ranked
    """,
)
def zorder_orders_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z key the clustered write sorts by, materialized per order so
    the oracle can pin the integer arithmetic bit-for-bit: rank
    (o_custkey, days-since-epoch(o_orderdate)) into 2^{Z_BITS} buckets
    from the table's observed min/max, then interleave. The layout
    effect itself (files tile the 2-d space; box predicates prune) is
    asserted on real written files in tests/test_zorder.py — file
    layout is not SQL-observable, the key arithmetic is."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].withColumn(
        "__days", F.datediff(F.col("o_orderdate"), F.lit(_EPOCH).cast("date"))
    )
    lo_a, hi_a, lo_b, hi_b = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("__days"), F.max("__days")
    ).first()
    if lo_a is None:  # empty table: anchors are arbitrary, result has no rows
        lo_a = hi_a = lo_b = hi_b = 0
    return o.select(
        "o_orderkey",
        zorder_key(
            rank_expr("o_custkey", lo_a, hi_a),
            rank_expr("__days", lo_b, hi_b),
        ).cast("bigint").alias("zkey"),
    )


# --------------------------------------------------------------------------
# Dynamic partition pruning: the OTHER layout-driven scan cut. Z-order
# prunes by column min/max stats inside files; partitioned layout + DPP
# prunes whole directories at runtime from the join's dim-side filter.
# --------------------------------------------------------------------------
@query(
    "dpp_partition_pruned_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
             AS total_price
    FROM orders o
    WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o.o_orderpriority
    """,
)
def dpp_partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end: orders written PARTITIONED
    BY o_orderpriority (the hive-style layout a 100 TB fact table has on
    its date/tenant key), then joined to a runtime-filtered dim of
    priorities. Catalyst injects the dim's build-side values as a
    partition filter into the fact scan (`dynamicpruning` subquery in
    the plan — asserted in tests/test_zorder.py), so only 2 of 5
    partition directories are read. The oracle is the equivalent static
    filter+agg: pruning must not change results, only the scan set.

    The partitioned layout lives in a stable scratch dir (overwritten
    per call), NOT a deleted tempdir: the returned plan stays lazily
    recomputable whenever the caller runs its action — no cache whose
    eviction would re-read a deleted source."""
    from disco_spark.session import scratch_dir

    t = load_tables(spark, sf_dir)
    path = scratch_dir("dpp_orders", sf_dir)
    t["orders"].write.partitionBy("o_orderpriority").mode(
        "overwrite"
    ).parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        t["orders"]
        .select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    )
    return (
        fact.join(dim, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
            .cast("double")
            .alias("total_price"),
        )
    )
