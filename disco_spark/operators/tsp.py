"""Travelling-salesman brute force — parity with the reference's
search-space-partitioned MapReduce solver (examples/tsp/
travelling_salesman.py: map_int_to_tour decodes an integer into a
unique tour via mixed-radix digits, lines 39-58; each mapper costs a
RANGE of the factorial(N-1) tour space and the reducer keeps the global
minimum, lines 73-120).

The Spark-first shape is the interesting part: the parallelism axis is
the SEARCH SPACE, not the data — `spark.range(factorial(N-1))` splits
the tour ids across tasks, every decode/cost is pure unrolled column
arithmetic (whole-stage codegen, no Python), and the "reduce" is a
1-row min aggregate. The same pattern covers any embarrassingly
parallel enumeration (grid search, combinatorial screening) at cluster
scale: ids in, argmin out, zero shuffle beyond the final aggregate.

Determinism: cities are the first N nations with md5-derived integer
coordinates; ties on cost break to the smallest tour id; costs sum in
a fixed unrolled order — so the DuckDB oracle replays the whole search
bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.sampling import hash_bucket
from disco_spark.session import load_tables

N_CITIES = 8  # factorial(7) = 5040 tours — the reference demos 9-13 nodes


def tsp_bruteforce(spark: SparkSession, coords: list[tuple[int, int]]) -> DataFrame:
    """Exact TSP over len(coords) cities: decode every tour id with the
    reference's mixed-radix scheme (unrolled — fixed N), cost it in one
    expression, keep the global argmin (smallest id on ties)."""
    n = len(coords)
    total = math.factorial(n - 1)
    xs = F.array(*[F.lit(float(x)) for x, _ in coords])
    ys = F.array(*[F.lit(float(y)) for _, y in coords])

    # unrolled mixed-radix decode: step s picks remaining[i % m], m = n-1-s
    df = spark.range(total).select(F.col("id").alias("tour_id"))
    df = df.withColumn("rem0", F.sequence(F.lit(1), F.lit(n - 1))).withColumn(
        "i0", F.col("tour_id")
    )
    for s in range(n - 1):
        m = n - 1 - s
        df = (
            df.withColumn(f"t{s + 1}", F.element_at(F.col(f"rem{s}"), ((F.col(f"i{s}") % m) + 1).cast("int")))
            .withColumn(f"rem{s + 1}", F.array_remove(F.col(f"rem{s}"), F.col(f"t{s + 1}")))
            .withColumn(f"i{s + 1}", F.expr(f"i{s} div {m}"))
        )
    tour_nodes = [F.lit(0)] + [F.col(f"t{s}") for s in range(1, n)] + [F.lit(0)]
    dist_terms = []
    for a, b in zip(tour_nodes[:-1], tour_nodes[1:]):
        dx = F.element_at(xs, (a + 1).cast("int")) - F.element_at(xs, (b + 1).cast("int"))
        dy = F.element_at(ys, (a + 1).cast("int")) - F.element_at(ys, (b + 1).cast("int"))
        dist_terms.append(F.sqrt(dx * dx + dy * dy))
    cost = dist_terms[0]
    for term in dist_terms[1:]:  # fixed left-to-right order = oracle order
        cost = cost + term
    scored = df.select(
        "tour_id",
        F.concat_ws("-", *[t.cast("string") for t in tour_nodes]).alias("tour"),
        F.round(cost, 6).alias("cost"),
    )
    best = scored.orderBy(F.asc("cost"), F.asc("tour_id")).limit(1)
    return best


def _duck_tsp_oracle(n: int) -> str:
    """Replay the identical search in DuckDB: same decode, same coords,
    same fixed-order cost sum, same tie-break."""
    from disco_spark.sampling import _bucket_sql

    coords_sql = f"""
    cities AS (
      SELECT n_nationkey AS node,
             {_bucket_sql("('x' || n_nationkey)", 1000)} AS x,
             {_bucket_sql("('y' || n_nationkey)", 1000)} AS y
      FROM nation WHERE n_nationkey < {n}
    ),
    xs AS (SELECT list(CAST(x AS DOUBLE) ORDER BY node) AS xs,
                  list(CAST(y AS DOUBLE) ORDER BY node) AS ys FROM cities)"""
    decode = ["t0 AS (SELECT i AS tour_id, i AS i0, "
              f"range(1, {n}) AS rem0 FROM generate_series(0, {math.factorial(n - 1) - 1}) AS g(i))"]
    for s in range(n - 1):
        m = n - 1 - s
        decode.append(f"""
    t{s + 1} AS (
      SELECT *, rem{s}[CAST(i{s} % {m} AS INT) + 1] AS n{s + 1},
             list_filter(rem{s}, x -> x <> rem{s}[CAST(i{s} % {m} AS INT) + 1]) AS rem{s + 1},
             i{s} // {m} AS i{s + 1}
      FROM t{s})""")
    nodes = ["0"] + [f"n{s}" for s in range(1, n)] + ["0"]
    terms = []
    for a, b in zip(nodes[:-1], nodes[1:]):
        terms.append(
            f"sqrt((xs[{a} + 1] - xs[{b} + 1]) * (xs[{a} + 1] - xs[{b} + 1])"
            f" + (ys[{a} + 1] - ys[{b} + 1]) * (ys[{a} + 1] - ys[{b} + 1]))"
        )
    cost = " + ".join(terms)
    tour = " || '-' || ".join(f"CAST({x} AS VARCHAR)" for x in nodes)
    return (
        "WITH " + coords_sql + "," + ",".join(decode)
        + f""",
    scored AS (
      SELECT tour_id, {tour} AS tour, ROUND({cost}, 6) AS cost
      FROM t{n - 1}, xs
    )
    SELECT tour_id, tour, cost FROM scored
    ORDER BY cost ASC, tour_id ASC LIMIT 1"""
    )


@query("tsp_nations_bruteforce", oracle=_duck_tsp_oracle(N_CITIES))
def tsp_nations_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shortest tour through the first 8 nations (md5-derived
    planar coordinates): 5040-tour search space partitioned across
    tasks, pure column decode+cost, 1-row argmin."""
    t = load_tables(spark, sf_dir)
    rows = (
        t["nation"]
        .filter(F.col("n_nationkey") < N_CITIES)
        .select(
            "n_nationkey",
            hash_bucket(
                F.concat(F.lit("x"), F.col("n_nationkey").cast("string")), 1000
            ).alias("x"),
            hash_bucket(
                F.concat(F.lit("y"), F.col("n_nationkey").cast("string")), 1000
            ).alias("y"),
        )
        .orderBy("n_nationkey")
        .collect()
    )
    coords = [(r["x"], r["y"]) for r in rows]
    return tsp_bruteforce(spark, coords)
