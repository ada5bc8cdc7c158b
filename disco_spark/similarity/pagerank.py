"""PageRank as a DataFrame loop — the reference's client-driven
iterative job (examples/datamining/page_rank.py: each iteration a
MapReduce job emitting rank/out_degree contributions, resubmitted by the
client until convergence) rebuilt per SURVEY §2.8's mapping of client
loops onto persisted DataFrame iterations.

Scale design: ranks and edges are co-partitioned on src across
iterations (one `repartition` up front, reused by every join), so each
iteration is one co-located join + one groupBy(dst) shuffle of (dst,
contribution) — the minimal movement PageRank admits. Nothing collects
to the driver; dangling mass is redistributed via a scalar agg (O(1)
rows to the driver per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def pagerank(
    edges: DataFrame, iters: int = 5, damping: float = 0.85, partitions: int = 32
) -> DataFrame:
    """(src, dst) edges -> (node, rank). Fixed iteration count,
    deterministic double arithmetic (contributions aggregated per dst
    with Spark's partial/final sum over a fixed partitioning).

    Fully lazy: every scalar the update needs (node count, per-iteration
    dangling mass) is a 1-row aggregate cross-joined into the plan
    (Catalyst broadcasts it), so the whole ``iters``-deep recursion is
    ONE plan with ONE action at the end — no per-iteration ``.first()``
    round-trips. Locally that removed ~1s of action overhead per
    iteration; on a cluster it removes ``iters`` driver barriers.
    Intermediates are persisted lazily: each contribs/ranks DF is
    referenced twice downstream, and without the persist the recompute
    chain would double per iteration.
    """
    # ONE shuffle for edge prep: after repartition on src, every (src,
    # dst) duplicate is already co-located, so Catalyst satisfies the
    # dropDuplicates clustering requirement without a second exchange
    # (verified: plan has a single Exchange). distinct-then-repartition
    # was two full edge shuffles.
    edges = (
        edges.select("src", "dst")
        .repartition(partitions, "src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # scalar spine: n as a broadcast 1-row frame (same IEEE double ops as
    # the former driver-side literals, so ranks are bit-identical)
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    cached = [edges, nodes, out_deg]
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )

    for _ in range(iters):
        # rank/deg combine at NODE cardinality first, then one edge-sized
        # join — the previous shape joined out_deg to the edge table every
        # iteration, an edge-cardinality join that contributes nothing at
        # node level. Same addends reach the same per-dst sum, so ranks
        # are unchanged (verified rank-for-rank at round-off).
        per_src = out_deg.join(ranks, out_deg.src == ranks.node).select(
            "src", (F.col("rank") / F.col("deg")).alias("c")
        )
        contribs = (
            edges.join(per_src, "src")
            .select("dst", "c")
            .groupBy("dst")
            .agg(F.sum("c").alias("recv"))
            .persist()
        )
        # dangling nodes (no out-edges) leak mass; redistribute uniformly
        dang_df = contribs.agg(
            F.coalesce(F.sum("recv"), F.lit(0.0)).alias("__linked")
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dang_df))
            .select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("recv"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("__linked")) / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
        # contribs is persisted (2 downstream refs); ranks is referenced
        # exactly once (next iteration's contribs join), so persisting it
        # would only add a materialization barrier
        cached.append(contribs)
    # Materialize the node-sized result once, then RELEASE every cached
    # intermediate — without this, each pagerank call leaked |edges| +
    # iters x |nodes| of executor storage for the session's lifetime
    # (visible as creeping slowdown across a bench run). localCheckpoint
    # also truncates the iters-deep lineage.
    result = ranks.localCheckpoint(eager=True)
    for df_ in cached:
        df_.unpersist()
    return result


def _pagerank_oracle_sql(iters: int, damping: float = 0.85) -> str:
    """Unroll the fixed-iteration PageRank as chained CTEs (aggregation
    is not allowed inside a recursive CTE term, so a WITH RECURSIVE
    formulation can't express the per-iteration groupBy; unrolling can).
    Float literals are forced ::DOUBLE so DuckDB doesn't route them
    through DECIMAL arithmetic — the engine computes (1.0 - 0.85) in
    IEEE double, and the oracle must hit the same bits."""
    parts = [
        """
    e0 AS (
      SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM lineitem
    ),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    params AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM params) AS rank FROM nodes)"""
    ]
    d = damping
    for i in range(1, iters + 1):
        parts.append(f"""
    c{i} AS (
      SELECT e.dst, SUM(r.rank / d.deg) AS recv
      FROM edges e JOIN deg d ON e.src = d.src JOIN r{i - 1} r ON e.src = r.node
      GROUP BY e.dst
    ),
    dang{i} AS (
      SELECT (1.0::DOUBLE - SUM(recv)) / (SELECT n FROM params) AS dang FROM c{i}
    ),
    r{i} AS (
      SELECT n.node,
             (1.0::DOUBLE - {d}::DOUBLE) / (SELECT n FROM params)
             + {d}::DOUBLE * (COALESCE(c.recv, 0.0::DOUBLE) + (SELECT dang FROM dang{i}))
               AS rank
      FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst
    )""")
    return (
        "WITH" + ",".join(parts)
        + f"\n    SELECT node, ROUND(rank, 9) AS rank FROM r{iters}"
    )


@query("pagerank_supplier_part", oracle=_pagerank_oracle_sql(iters=3))
def pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite supplier->part graph from lineitem
    (distinct (l_suppkey, l_partkey) edges, reversed edges added so the
    chain is ergodic), ranks rounded for cross-run stability.

    The iteration runs on INTEGER node ids (supplier k -> 2k, part k ->
    2k+1); the display names ('s<k>'/'p<k>') are built only on the final
    node-sized result. Every edge-table shuffle (dedup, co-partition,
    per-dst sums) then hashes/compares 8-byte longs instead of strings —
    measured ~25% faster warm and ~2x cold at sf0.1, and at 100 TB the
    shuffle-volume cut scales with |edges|. Rank VALUES are unchanged:
    the arithmetic depends only on graph structure, not id encoding."""
    t = load_tables(spark, sf_dir)
    # both orientations emitted IN-ROW (explode of a 2-struct array):
    # the old fwd.unionAll(back) embedded — and really executed — the
    # lineitem scan in both arms (one 64-task scan stage at sf0.1);
    # one arm per row halves the work feeding the dedup exchange
    # (guide §2.4, the _both_orientations pattern from the co-order
    # kernels)
    s_node = F.col("l_suppkey") * 2
    p_node = F.col("l_partkey") * 2 + 1
    both = F.array(
        F.struct(s_node.alias("src"), p_node.alias("dst")),
        F.struct(p_node.alias("src"), s_node.alias("dst")),
    )
    edges = (
        t["lineitem"]
        .select(F.explode(both).alias("_e"))
        .select("_e.src", "_e.dst")
    )
    ranks = pagerank(edges, iters=3)
    return ranks.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("s"), (F.col("node") / 2).cast("long")),
        )
        .otherwise(F.concat(F.lit("p"), ((F.col("node") - 1) / 2).cast("long")))
        .alias("node"),
        F.round(F.col("rank"), 9).alias("rank"),
    )
