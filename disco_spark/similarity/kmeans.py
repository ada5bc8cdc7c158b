"""Iterative k-means over the embeddings table — the reference's
client-driven iterative-job pattern (examples/datamining/
kclustering.py:60-120: each iteration is a full MapReduce job resubmitted
by the client loop; estimate step = nearest-center map, maximize step =
per-center mean reduce) rebuilt as a DataFrame loop with `persist()`
(SURVEY §2.8 maps these client loops to exactly this shape).

Scale design: each iteration is one scan + one groupBy(center) shuffle of
(cluster_id, partial sums) — centers travel to executors as a broadcast
literal array, never the data to the driver (only the k centroid rows
collect, which is O(k·dim)). Deterministic: init = first k vectors by
vec_id, fixed iteration count, double arithmetic in a fixed reduction
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def _nearest(centers: list[list[float]]):
    """Column expr: index of the nearest center (squared L2) for the
    `embedding` column; centers inlined as ONE array-of-arrays literal
    and scanned with a single transform() lambda (the earlier forms —
    k separate aggregate expressions, then k*dim literal nodes — grew
    the expression tree with k and paid for it in planning/codegen;
    measured 3x at k=45 for the first). Same element order, same fold,
    same first-index tie-break, so assignments are bit-identical and
    the unrolled DuckDB oracle still matches. The residual per-row cost
    is the interpreted higher-order-function evaluation (HOF lambdas
    never enter whole-stage codegen) — acceptable because assignment
    runs once per session per input (converged-centers cache)."""
    emb = F.col("embedding")
    # ONE nested-array literal node (not k*dim CreateArray children):
    # the expression tree stays constant-size as k grows with sqrt(n) —
    # same values, same fold, bit-identical assignments (A/B-verified)
    cents = F.lit([[float(x) for x in c] for c in centers])
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(
                emb, c, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.array_position(dists, F.array_min(dists)) - 1


_CENTERS_CACHE: dict[tuple, list] = {}


def _plan_key(e: DataFrame, *params):
    """Cache key for deterministic driver-side training state — same
    contract as pq_train's codebook cache: (application, input file
    FINGERPRINTS, LOGICAL PLAN, params). Fingerprints (size+mtime_ns, via
    session.file_fingerprints) rather than bare paths: an in-place
    rewrite of the input parquet during one long-lived application must
    miss the cache, matching the on-disk manifests' staleness contract.
    The plan text distinguishes filtered views of the same files; when
    any component is unavailable (Spark Connect), return None and the
    caller skips caching."""
    try:
        from disco_spark.session import file_fingerprints

        return (
            e.sparkSession.sparkContext.applicationId,
            tuple(tuple(f) for f in file_fingerprints(e.inputFiles())),
            e._jdf.queryExecution().logical().toString(),
            *params,
        )
    except Exception:
        return None


def kmeans_assign(e: DataFrame, k: int = 8, iters: int = 5) -> DataFrame:
    """Lloyd's algorithm; returns (vec_id, cluster) assignments.

    The estimate step is pure column expressions (whole-stage codegen);
    the maximize step is posexplode + groupBy(cluster, pos) mean — one
    shuffle of k·dim partial aggregates per iteration.

    Training is deterministic, so the CONVERGED CENTERS are cached per
    (application, input, k, iters) — the k-centroid literals are the
    only driver state (a few KB). Queries sharing a quantizer (the
    adaptive k-NN graph and the embedding dedup both call
    adaptive_cells on the same table) train ONCE per session and every
    later call is a single lazy codegen pass with zero driver actions —
    the 'train once, serve many' shape index_store persists across
    sessions, applied within one."""
    key = _plan_key(e, k, iters)
    cached = _CENTERS_CACHE.get(key) if key is not None else None
    if cached is not None:
        return e.select("vec_id", "embedding").withColumn(
            "cluster", _nearest(cached)
        ).select("vec_id", "cluster")
    e = e.select("vec_id", "embedding").persist()
    centers = [
        [float(x) for x in r["embedding"]]
        for r in e.orderBy("vec_id").limit(k).collect()
    ]
    for _ in range(iters):
        assigned = e.withColumn("cluster", _nearest(centers))
        # decimal-accumulated mean: avg() over doubles is shuffle-order-
        # dependent, and with sqrt(n) cells the decision boundaries are
        # dense enough that 1-ulp centroid jitter flips assignments
        # between runs (observed as flaky downstream recall). Exact
        # decimal sums make the whole algorithm run-to-run deterministic;
        # the oracle mirrors the same accumulation.
        new_rows = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("double").cast("decimal(38,18)"))
                    / F.count(F.lit(1))
                )
                .cast("double")
                .alias("m")
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        centers = [
            [by_cluster[c][p] for p in sorted(by_cluster[c])]
            if c in by_cluster
            else centers[c]  # empty cluster keeps its center
            for c in range(k)
        ]
    out = e.withColumn("cluster", _nearest(centers)).select("vec_id", "cluster")
    e.unpersist()
    if key is not None:
        _CENTERS_CACHE[key] = centers
    return out


def kmeans_ctes(k_expr: str | int, iters: int, source: str = "embeddings") -> str:
    """Unrolled Lloyd CTE chain (no WITH / final SELECT): c0 init,
    a{i}/n{i}/c{i} per iteration, `afinal` = (vec_id, cluster).

    `k_expr` may be an int literal or any SQL scalar expression DuckDB
    accepts inside LIMIT — e.g. a subquery computing ceil(sqrt(n)), which
    is how the adaptive-cell oracles replay a data-dependent k
    (similarity/ann.py). Composable: callers append their own CTEs after
    this chain and select from `afinal`. ``source`` is the (vec_id,
    embedding) relation to cluster — a table/view name or a CTE the
    caller prepends (the planted-cluster recall audit clusters a
    vectors-derived CTE, not the embeddings table)."""

    def assign(name: str, centers: str) -> str:
        return f"""
    {name} AS (
      SELECT vec_id, cluster FROM (
        SELECT e.vec_id, c.cluster,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.embedding::DOUBLE[], c.centroid), c.cluster
               ) AS rn
        FROM {source} e CROSS JOIN {centers} c
      ) WHERE rn = 1
    )"""

    k = f"({k_expr})" if isinstance(k_expr, str) else k_expr
    parts = [
        f"""
    c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster,
             embedding::DOUBLE[] AS centroid
      FROM (SELECT vec_id, embedding FROM {source} ORDER BY vec_id LIMIT {k})
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(assign(f"a{i}", f"c{i - 1}"))
        parts.append(f"""
    n{i} AS (
      SELECT cluster, list(m ORDER BY pos) AS centroid FROM (
        SELECT cluster, pos,
               CAST(SUM(CAST(val AS DECIMAL(38,18))) / COUNT(*) AS DOUBLE) AS m
        FROM (
          SELECT a.cluster, generate_subscripts(e.embedding, 1) AS pos,
                 unnest(e.embedding)::DOUBLE AS val
          FROM {source} e JOIN a{i} a USING (vec_id)
        ) GROUP BY cluster, pos
      ) GROUP BY cluster
    ),
    c{i} AS (
      SELECT p.cluster, COALESCE(n.centroid, p.centroid) AS centroid
      FROM c{i - 1} p LEFT JOIN n{i} n USING (cluster)
    )""")
    parts.append(assign("afinal", f"c{iters}"))
    return ",".join(parts)


def _kmeans_oracle_sql(k: int, iters: int) -> str:
    """Full replay oracle for kmeans_assign — see kmeans_ctes."""
    return "WITH" + kmeans_ctes(k, iters) + "\n    SELECT vec_id, cluster FROM afinal"


@query("kmeans_embedding_clusters", oracle=_kmeans_oracle_sql(k=8, iters=3))
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return kmeans_assign(t["embeddings"], k=8, iters=3)
