"""Triangle counting over the supplier co-supply graph — the third
classic distributed graph kernel alongside PageRank
(similarity/pagerank.py) and connected components (dedup/cc.py).
Reference analog: none (the reference ships PageRank and k-means as
example jobs; triangle counting is the canonical next kernel a graph
user reaches for — clustering-coefficient / community-density audits).

Graph: suppliers are nodes; an edge connects two suppliers that ship at
least one common part (distinct (l_suppkey, l_partkey) pairs from
lineitem, self-joined per part). Hub parts (more than MAX_PART_DEGREE
suppliers) are dropped before pair generation — the same frequency-cap
guard every pair generator in this repo uses (LSH bands, exact spans):
a hub part contributes O(d^2) edges and says nothing about community
structure.

Scale story: the compact-forward counting scheme — orient every edge
u < v, join edges-with-edges on the shared middle vertex, then verify
the closing edge with a third join. Each triangle {u < v < w} is
counted exactly once as (u,v) + (v,w) + (u,w). Three hash joins on
vertex keys, no per-node adjacency materialization, no driver state;
per-node counts are one explode + groupBy. This is the standard
MapReduce triangle algorithm (Suri & Vassilvitskii, "Counting
Triangles and the Curse of the Last Reducer" — the hub cap is exactly
their high-degree mitigation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables

MAX_PART_DEGREE = 50


def cosupply_edges(lineitem: DataFrame, cap: int = MAX_PART_DEGREE) -> DataFrame:
    """(u, v) with u < v: distinct supplier pairs sharing a part."""
    sp = lineitem.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    deg = Window.partitionBy("p")
    sp = (
        sp.withColumn("d", F.count(F.lit(1)).over(deg))
        .filter(F.col("d") <= cap)
        .drop("d")
    )
    a = sp.select("p", F.col("s").alias("u"))
    b = sp.select("p", F.col("s").alias("v"))
    return (
        a.join(b, "p")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, n_triangles) for every node in >= 1 triangle; edges must
    be oriented u < v and distinct."""
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b")  # a < b < c by construction
    tris = wedges.join(e3, ["a", "c"])
    nodes = tris.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH sp AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    capped AS (
      SELECT s, p FROM (
        SELECT s, p, COUNT(*) OVER (PARTITION BY p) AS d FROM sp
      ) WHERE d <= {MAX_PART_DEGREE}
    ),
    edges AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM capped a JOIN capped b ON a.p = b.p AND a.s < b.s
    ),
    tris AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    nodes AS (
      SELECT a AS node FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    SELECT node, COUNT(*) AS n_triangles FROM nodes GROUP BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return triangle_counts(cosupply_edges(t["lineitem"]))
