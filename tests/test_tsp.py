"""TSP brute force: oracle parity + decode bijectivity."""

from __future__ import annotations

import math

from disco_spark import registry
from disco_spark.operators.tsp import tsp_bruteforce
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()


def test_tsp_oracle(spark):
    compare_query(spark, "tsp_nations_bruteforce", SF_SMOKE)


def test_decode_is_bijective(spark):
    """Every tour id must decode to a distinct Hamiltonian cycle: for a
    5-city instance all factorial(4)=24 tours are distinct permutations
    starting and ending at 0."""
    coords = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 5)]
    # rebuild the full scored frame (not just the argmin) via the
    # internals: run with a trivial graph and inspect all decoded tours
    n = len(coords)
    from pyspark.sql import functions as F

    df = spark.range(math.factorial(n - 1)).select(F.col("id").alias("tour_id"))
    df = df.withColumn("rem0", F.sequence(F.lit(1), F.lit(n - 1))).withColumn(
        "i0", F.col("tour_id")
    )
    for s in range(n - 1):
        m = n - 1 - s
        df = (
            df.withColumn(
                f"t{s + 1}",
                F.element_at(F.col(f"rem{s}"), ((F.col(f"i{s}") % m) + 1).cast("int")),
            )
            .withColumn(f"rem{s + 1}", F.array_remove(F.col(f"rem{s}"), F.col(f"t{s + 1}")))
            .withColumn(f"i{s + 1}", F.expr(f"i{s} div {m}"))
        )
    tours = [
        tuple(r[f"t{s}"] for s in range(1, n)) for r in df.collect()
    ]
    assert len(tours) == 24
    assert len(set(tours)) == 24  # bijective
    assert all(sorted(t) == [1, 2, 3, 4] for t in tours)  # permutations


def test_known_optimum_square(spark):
    """4 corners of a square + center: the optimal tour walks the
    perimeter (cost 40) with the center visited en route — brute force
    must beat any tour that crosses the square's diagonals."""
    coords = [(0, 0), (10, 0), (10, 10), (0, 10)]
    best = tsp_bruteforce(spark, coords).collect()[0]
    assert best.cost == 40.0
