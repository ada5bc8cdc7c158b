"""Generate a scaled-up benchmark dataset by replicating sf0.1 with
key offsets (TPC-H-style entity scaling: R replicas = R x more
customers/orders/docs, dims fixed).

PERF EXPERIMENT ONLY — the output lives under the repo
(benchdata/sfN/), is never used as an oracle input, and exists to
measure how each headline plan's wall time scales with data volume
(PERFORMANCE.md records the factors). /root/testdata is never touched.

Replica integrity:
- every foreign key gets the same per-replica offset as its referenced
  key, so join cardinalities scale linearly (10x rows -> 10x matches,
  never 100x);
- nation/region stay fixed (dims), so broadcast-join shapes persist;
- documents.text is salted per replica by interleaving a replica token
  after every original token: within-replica near-dup structure is
  preserved (the transformation is applied uniformly), while every
  cross-replica shingle differs — so LSH/Jaccard pair density per doc
  stays constant instead of inflating quadratically with replicas;
- embeddings get a small deterministic per-replica rotation-free
  perturbation (component i += 0.05 * sin(replica * (i + 1))), keeping
  replicas' vectors distinct enough that cosine near-dup pair counts
  scale linearly.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from disco_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"

# key column -> per-replica offset (a clean power of ten above the key's
# max at sf0.1, so replica blocks never collide)
OFFSETS = {
    "c_custkey": 100_000,
    "o_custkey": 100_000,
    "s_suppkey": 10_000,
    "l_suppkey": 10_000,
    "p_partkey": 100_000,
    "l_partkey": 100_000,
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "event_id": 1_000_000,
    "user_id": 100_000,
    "doc_id": 10_000,
    "vec_id": 10_000,
}

SCALED = ("customer", "supplier", "part", "orders", "lineitem", "events",
          "documents", "embeddings")
FIXED = ("nation", "region")


def replicate(df, replicas: int):
    r = F.col("__r")
    reps = df.sparkSession.range(replicas).select(F.col("id").alias("__r"))
    out = df.crossJoin(reps)
    for c in df.columns:
        if c in OFFSETS:
            out = out.withColumn(c, F.col(c) + r * F.lit(OFFSETS[c]))
    if "text" in df.columns:
        # interleave ' r<r>x' after every token: uniform within a replica
        # (near-dup structure preserved), shingle-disjoint across replicas
        salt = F.concat(F.lit(" r"), r.cast("string"), F.lit("x "))
        out = out.withColumn("text", F.regexp_replace(F.col("text"), r"\s+", salt))
        if "n_chars" in df.columns:
            out = out.withColumn("n_chars", F.length("text").cast("long"))
    if "embedding" in df.columns:
        out = out.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (
                    x + F.lit(0.05) * F.sin(r.cast("double") * (i.cast("double") + 1))
                ).cast("float"),
            ),
        )
    return out.drop("__r")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dest = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1")
    os.makedirs(dest, exist_ok=True)
    spark = get_spark("make_scaled_data")
    for name in SCALED:
        src = os.path.join(SRC, f"{name}.parquet")
        df = spark.read.parquet(src)
        out = replicate(df, replicas)
        out.write.mode("overwrite").parquet(os.path.join(dest, f"{name}.parquet"))
        print(f"{name}: wrote {replicas}x", flush=True)
    for name in FIXED:
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(dest, f"{name}.parquet"))
        print(f"{name}: copied", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
