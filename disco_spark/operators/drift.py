"""Distribution-drift detection: Population Stability Index between
each source's document-length distribution and the corpus overall —
the standing ML-ops monitor that catches a crawler/source going weird
before it poisons a training mix (same construction monitors feature
drift between model training and serving).

PSI = sum_i (p_i - q_i) * ln(p_i / q_i) over fixed bins; the standard
reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 action. Bins
here are fixed n_chars ranges (powers-of-two edges), so the binning is
data-independent — at 100 TB each snapshot bins in one scan and the
PSI compares bin COUNTS, never raw rows. Laplace-style smoothing
(+1 per bin) keeps empty bins finite and is replayed identically in
the oracle.

Reference analog: none (beyond-reference surface, like
operators/profile.py's snapshot diff — this is its statistical
sibling: not WHICH rows changed but whether the SHAPE changed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables

# fixed power-of-two n_chars bin edges: 0-63, 64-127, ..., >=2048
BIN_EDGES = [64, 128, 256, 512, 1024, 2048]


def _bin_expr_spark():
    b = F.lit(len(BIN_EDGES))
    for i, edge in reversed(list(enumerate(BIN_EDGES))):
        b = F.when(F.col("n_chars") < edge, i).otherwise(b)
    return b


def _bin_expr_sql() -> str:
    cases = " ".join(
        f"WHEN n_chars < {edge} THEN {i}" for i, edge in enumerate(BIN_EDGES)
    )
    return f"CASE {cases} ELSE {len(BIN_EDGES)} END"


def psi_by_source(docs: DataFrame) -> DataFrame:
    """(source, psi) for a documents-shaped DataFrame — the engine plan
    behind drift_psi_sources, exposed so tests exercise the SHIPPED
    construction (smoothing, bin grid) rather than a copy."""
    spark = docs.sparkSession
    n_bins = len(BIN_EDGES) + 1
    binned = docs.select("source", _bin_expr_spark().alias("bin"))
    per_source = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    # the source axis comes from per_source (every source has >= 1 row
    # there), NOT a second scan of docs — at 100 TB the corpus scan is
    # the entire cost and this operator needs exactly one
    grid = (
        per_source.select("source")
        .distinct()
        .crossJoin(
            spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
        )
        .join(per_source, ["source", "bin"], "left")
        .select(
            "source", "bin", (F.coalesce(F.col("c"), F.lit(0)) + 1).alias("c_smooth")
        )
    )
    totals = grid.groupBy("source").agg(F.sum("c_smooth").alias("t"))
    overall = grid.groupBy("bin").agg(F.sum("c_smooth").alias("oc"))
    otot = overall.agg(F.sum("oc").alias("ot"))
    p = F.col("c_smooth") * F.lit(1.0) / F.col("t")
    q = F.col("oc") * F.lit(1.0) / F.col("ot")
    return (
        grid.join(totals, "source")
        .join(overall, "bin")
        .crossJoin(F.broadcast(otot))
        .withColumn("term", (p - q) * F.log(p / q))
        .groupBy("source")
        .agg(
            F.round(
                F.sum(F.col("term").cast("decimal(28,15)")).cast("double"), 6
            ).alias("psi")
        )
    )


@query(
    "drift_psi_sources",
    oracle=f"""
    WITH binned AS (
      SELECT source, {_bin_expr_sql()} AS bin FROM documents
    ),
    per_source AS (
      SELECT source, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
    ),
    grid AS (
      SELECT s.source, b.bin, COALESCE(p.c, 0) + 1 AS c_smooth
      FROM (SELECT DISTINCT source FROM per_source) s
      CROSS JOIN (SELECT unnest(generate_series(0, {len(BIN_EDGES)})) AS bin) b
      LEFT JOIN per_source p ON p.source = s.source AND p.bin = b.bin
    ),
    totals AS (
      SELECT source, CAST(SUM(c_smooth) AS BIGINT) AS t FROM grid GROUP BY 1
    ),
    overall AS (
      SELECT bin, CAST(SUM(c_smooth) AS BIGINT) AS oc FROM grid GROUP BY 1
    ),
    otot AS (SELECT CAST(SUM(oc) AS BIGINT) AS ot FROM overall),
    terms AS (
      SELECT g.source,
             (g.c_smooth * 1.0 / t.t - o.oc * 1.0 / otot.ot)
               * ln((g.c_smooth * 1.0 / t.t) / (o.oc * 1.0 / otot.ot)) AS term
      FROM grid g
      JOIN totals t USING (source)
      JOIN overall o USING (bin)
      CROSS JOIN otot
    )
    SELECT source,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(28,15))) AS DOUBLE), 6) AS psi
    FROM terms GROUP BY source
    """,
)
def drift_psi_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, psi): PSI of each source's length distribution vs the
    whole corpus. Per-bin terms are doubles (ln), summed through an
    exact decimal accumulator and rounded to 6 — the same cross-engine
    discipline as the LM scorer. The +1-per-bin smoothing means every
    (source, bin) cell exists on both engines by construction."""
    t = load_tables(spark, sf_dir)
    return psi_by_source(t["documents"])
