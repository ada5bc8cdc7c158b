"""Skew-mitigation operators: salted join and salted two-phase
aggregation.

AQE's skew-join splitting (on in `session.py`) handles most skew at
runtime; these explicit forms exist for the cases AQE can't touch —
skew inside a Python compat stage (DiscoJob custom partitioner), or a
key so hot one reducer would otherwise own >> its share even after AQE
splits (the reference had the same problem with hot labels and no
remedy at all; SURVEY §2.4).

Semantics are preserved exactly: salting only refines the partitioning,
every (key,) group is still complete after the final combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from disco_spark.registry import query


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `large` has hot keys: spread each key over
    `n_salts` shuffle partitions; replicate `small` once per salt.

    The large side's salt is derived from a hash of the whole row
    (xxhash64 over all columns), so a hot key's rows scatter uniformly
    and deterministically — no rand(), so re-computation under task
    retry yields the same placement. Shuffle volume: large side
    unchanged, small side × n_salts (use for small-but-not-broadcastable
    right sides).
    """
    salt_l = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    l_salted = large.withColumn("__salt", salt_l.cast("int"))
    s_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        l_salted.join(s_salted, [on, "__salt"], how)
        .drop("__salt")
    )


def hot_cold_split_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: DataFrame,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Differentiated skew join: rows whose key is in `hot_keys` (a
    one-column DataFrame of `on` values, small enough to broadcast) go
    through the salted join; everything else takes the plain equi-join.
    Only hot-key rows of `small` pay the ×n_salts replication — the
    production shape for head-heavy key distributions (stopword
    shingles, null-ish ids, power-law entities).

    Each input row lands in exactly one branch (broadcast semi/anti on
    the same hot set), so inner and left joins partition cleanly and the
    union equals the plain join exactly.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"hot_cold_split_join supports inner/left, got {how!r}")
    hot = F.broadcast(hot_keys.select(on).distinct())
    l_hot = large.join(hot, on, "left_semi")
    l_cold = large.join(hot, on, "left_anti")
    s_hot = small.join(hot, on, "left_semi")
    s_cold = small.join(hot, on, "left_anti")
    hot_joined = salted_join(l_hot, s_hot, on, n_salts=n_salts, how=how)
    cold_joined = l_cold.join(s_cold, on, how)
    return hot_joined.unionByName(cold_joined)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    finals: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial agg on
    (keys + salt), final combine on keys.

    `aggs` are the partial aggregate expressions (must be algebraic —
    sum/count/min/max — each aliased); `finals` re-combine the partial
    columns (referencing the aliases) into the result. Catalyst already
    does partial+final hash aggregation; this form additionally splits a
    single hot key's PARTIAL state across n_salts tasks, which matters
    when one key dominates a partition even pre-shuffle.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt.cast("int"))
        .groupBy(*keys, "__salt")
        .agg(*aggs)
    )
    return partial.groupBy(*keys).agg(*finals)


@query(
    "join_skew_salted",
    # the oracle is the PLAIN join+agg: salting must be invisible in the
    # result — it only refines partitioning. Decimal accumulation makes
    # the two-phase salted sum exactly equal the one-phase SQL sum.
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(20,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark, sf_dir):
    """Revenue by order priority routed through the EXPLICIT skew
    machinery: salted_join spreads each order key over 8 salt slots,
    then salted_agg two-phases the per-priority sum (partial decimal
    sums on (priority, salt), exact final combine). Results are
    bit-equal to the plain join+agg — the whole point: salting is a
    partitioning refinement, not a semantic change. AQE's runtime skew
    splitting (on in session.py) covers most real skew; this explicit
    form is for skew AQE can't see (inside compat stages, or a key so
    hot map-side partials already overflow one task)."""
    from disco_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("okey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(20,6)")
        .alias("rev"),
    )
    orders = t["orders"].select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "okey", n_salts=8)
    return salted_agg(
        joined.select("o_orderpriority", "rev"),
        keys=["o_orderpriority"],
        aggs=[
            F.count(F.lit(1)).alias("pn"),
            F.sum("rev").alias("ps"),
        ],
        finals=[
            F.sum("pn").alias("n_items"),
            F.sum("ps").cast("double").alias("revenue"),
        ],
    )


@query(
    "join_bloom_prefiltered",
    # oracle = the PLAIN join: the bloom prefilter must be invisible in
    # the result (no false negatives), exactly like the salted join's
    # contract — revenue per supplier for one nation's suppliers (NATION_7 in this synthetic naming)
    oracle="""
    SELECT l.l_suppkey,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS DOUBLE) / 100 AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY l.l_suppkey
    """,
)
def join_bloom_prefiltered(spark, sf_dir: str):
    """Bloom-prefiltered fact join — the runtime-filter technique that
    makes selective dim joins viable at 100 TB: the qualifying
    supplier keys (small side) fold into a broadcast bloom bitset
    (textops.vocab.bloom_build — same packed-word bitset the
    contamination screen uses), and the lineitem scan drops non-
    matching rows in JVM bit arithmetic BEFORE the shuffle join. False
    positives only cost wasted shuffle rows; the exact join removes
    them, so the result equals the plain join bit-for-bit (the oracle
    IS the plain join). Spark's own runtime bloom
    (spark.sql.optimizer.runtime.bloomFilter) applies the same idea
    planner-side; the explicit form works on any column expression and
    under compat stages the optimizer can't see through."""
    from disco_spark.session import load_tables
    from disco_spark.textops.vocab import bloom_build, bloom_might_contain

    t = load_tables(spark, sf_dir)
    suppliers = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_7")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey")
    )
    bloom, m = bloom_build(spark, suppliers, "s_suppkey")
    li = (
        t["lineitem"]
        .crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain("bloom", "l_suppkey", m))
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(F.broadcast(suppliers), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_suppkey")
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                    ).cast("bigint")
                ).cast("double")
                / 100
            ).alias("revenue")
        )
    )
