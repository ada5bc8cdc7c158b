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

--vocab-growth[=BETA] (default BETA=0.5) replaces the interleave salt
with Heaps-law token mutation. The interleave FREEZES the token
vocabulary (base corpus: 31 types; salted 10x: 31 + 10 salt types) and
COLLAPSES the 3-shingle vocabulary (27,213 -> 9,620 at 10x docs,
because every shingle degenerates to (tok, rNx, tok) forms), so df per
shingle explodes ~55x and every df-conditioned dedup plan measures the
artifact's quadratic candidate volume, not the plan (round-10 VERDICT
"What's missing" #2). Real corpora grow vocabulary as V ~ k*N^beta
(Heaps' law, beta ~ 0.4-0.6), which keeps rare shingles rare and
candidate volume near-linear. The growth mode synthesizes that:

- replica 0 is the base corpus VERBATIM (p_0 = 0);
- replica r >= 1 mutates token TYPE t iff
  hash(t, r) < p_r, with p_r = (r+1)^beta - r^beta, the mutated form
  t||'g'||r being unique to the replica — so corpus token vocabulary is
  exactly V0 * R^beta (sum of the telescoping p_r series), df per
  surviving base shingle grows sub-linearly, and replica-specific
  shingles stay rare;
- mutation is deterministic per (type, replica) (xxhash64 draw), so
  within-replica near-dup structure is preserved EXACTLY (uniform
  substitution), token adjacency survives (in-place, no insertions),
  and cross-replica copies of a doc fall below Jaccard ~0.45 at
  beta=0.5 (shingle survival (1-p_r)^3 <= 0.2), keeping the true pair
  set linear in replicas like the interleave mode.
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


def _heaps_mutated_text(r, beta: float):
    """text column expression for --vocab-growth: replica-deterministic
    token-type mutation at rate p_r = (r+1)^beta - r^beta (p_0 = 0).
    The hash draw keys on (type, replica) only, so every occurrence of
    a type inside a replica mutates identically — near-dup structure is
    preserved exactly while corpus vocabulary grows as V0 * R^beta."""
    rd = r.cast("double")
    p = F.when(r == 0, F.lit(0.0)).otherwise(
        F.pow(rd + 1, F.lit(beta)) - F.pow(rd, F.lit(beta))
    )
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))
    draw = lambda t: (  # noqa: E731  uniform in [0,1) per (type, replica)
        F.pmod(F.xxhash64(F.lit("vg"), t, r), F.lit(1_000_000)) / 1_000_000.0
    )
    mutated = F.transform(
        toks,
        lambda t: F.when(
            draw(t) < p, F.concat(t, F.lit("g"), r.cast("string"))
        ).otherwise(t),
    )
    return F.array_join(mutated, " ")


def replicate(df, replicas: int, vocab_beta: float | None = None):
    r = F.col("__r")
    reps = df.sparkSession.range(replicas).select(F.col("id").alias("__r"))
    out = df.crossJoin(reps)
    for c in df.columns:
        if c in OFFSETS:
            out = out.withColumn(c, F.col(c) + r * F.lit(OFFSETS[c]))
    if "text" in df.columns:
        if vocab_beta is not None:
            out = out.withColumn("text", _heaps_mutated_text(r, vocab_beta))
        else:
            # interleave ' r<r>x' after every token: uniform within a
            # replica (near-dup structure preserved), shingle-disjoint
            # across replicas
            salt = F.concat(F.lit(" r"), r.cast("string"), F.lit("x "))
            out = out.withColumn(
                "text", F.regexp_replace(F.col("text"), r"\s+", salt)
            )
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
    args = sys.argv[1:]
    vocab_beta: float | None = None
    rest = []
    for a in args:
        if a == "--vocab-growth":
            vocab_beta = 0.5
        elif a.startswith("--vocab-growth="):
            vocab_beta = float(a.split("=", 1)[1])
        else:
            rest.append(a)
    replicas = int(rest[0]) if rest else 10
    dest = rest[1] if len(rest) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf1g" if vocab_beta is not None else "sf1")
    os.makedirs(dest, exist_ok=True)
    spark = get_spark("make_scaled_data")
    for name in SCALED:
        src = os.path.join(SRC, f"{name}.parquet")
        df = spark.read.parquet(src)
        out = replicate(df, replicas, vocab_beta)
        out.write.mode("overwrite").parquet(os.path.join(dest, f"{name}.parquet"))
        print(f"{name}: wrote {replicas}x", flush=True)
    for name in FIXED:
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(dest, f"{name}.parquet"))
        print(f"{name}: copied", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
