"""TPC-H-adapted decision-support shapes, batch 2 (SURVEY §2.5 parity).

The reference expresses every one of these access patterns as hand-written
map/partition/reduce pipelines (tests/test_query.py:11-57 hash join,
examples/util/simple_innerjoin.py, lib/disco/util.py:319-388 external
sort); here each is a declarative DataFrame plan so Catalyst picks
broadcast-vs-shuffle, pushes filters to the scan, and AQE handles skew.
The schema lacks partsupp/commit-receipt-dates/shipmode, so Q2/Q9/Q11/
Q20-class queries are adapted to the columns that exist (noted per query).

Scale notes (100 TB thinking):
- every "scalar subquery" (Q11 threshold, Q15 max, Q17 per-part avg,
  Q22 avg balance) is computed as a tiny aggregate DataFrame and
  broadcast — no driver collect, no second scan of the fact table
  beyond what the semantics require.
- min/max-within-group (Q2, Q15) is agg + broadcast self-join rather
  than a window over the whole set: the grouped aggregate shrinks the
  data *before* the shuffle that distributes the extrema.
- distinct (l_partkey, l_suppkey) in Q2 happens before joining dims so
  the dedup shuffle moves two int columns, not the whole row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.operators.relational import dsum
from disco_spark.registry import query
from disco_spark.session import lazy_persist, load_tables


# ---------------------------------------------------------------------------
# Q2 shape: minimum-within-correlated-group. No partsupp table exists, so
# the "min supplycost supplier per part" becomes "min acctbal supplier among
# the suppliers that actually shipped the part" (derived from lineitem).
# ---------------------------------------------------------------------------
@query(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
      FROM part
        JOIN ps ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
      WHERE p_type = 'LARGE' AND p_size <= 10
    )
    SELECT c.p_partkey, c.p_name, c.s_name, c.s_acctbal
    FROM cand c
      JOIN (SELECT p_partkey AS mk, MIN(s_acctbal) AS mbal
            FROM cand GROUP BY p_partkey) m
        ON c.p_partkey = m.mk AND c.s_acctbal = m.mbal
    """,
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ps = t["lineitem"].select("l_partkey", "l_suppkey").distinct()
    part = t["part"].filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
    cand = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("mk")).agg(F.min("s_acctbal").alias("mbal"))
    return cand.join(
        F.broadcast(mins),
        (cand.p_partkey == mins.mk) & (cand.s_acctbal == mins.mbal),
    ).select("p_partkey", "p_name", "s_name", "s_acctbal")


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations by year. Two independent
# nation lookups (supplier side, customer side) on the same broadcast dim.
# ---------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share of one nation's suppliers within a region, by
# year. The share is a ratio of two decimal-exact sums (conditional
# numerator), computed in one aggregate pass.
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_5'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                AS DECIMAL(20,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
           AS DOUBLE) AS mkt_share
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part     ON l_partkey = p_partkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["part"].filter(F.col("p_type") == "ECONOMY")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("c_rk") == F.col("r_regionkey"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0))
        .cast("decimal(20,6)")
    ).cast("double")
    den = F.sum(vol.cast("decimal(20,6)")).cast("double")
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((num / den).cast("double").alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year. No partsupp, so the
# cost term uses p_retailprice instead of ps_supplycost.
# ---------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity AS DECIMAL(20,6))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part     ON l_partkey = p_partkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_name").like("%widget%"))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit, "sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: important parts — per-part value HAVING > fraction of the
# grand total. The total is recomputed from base rows with the same
# decimal accumulation (never re-summing the per-group doubles, which
# would reintroduce order dependence), then broadcast as a 1-row join.
# ---------------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle="""
    WITH base AS (
      SELECT l_partkey, l_extendedprice * (1 - l_discount) AS v
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    ),
    val AS (SELECT l_partkey AS partkey,
                   CAST(SUM(CAST(v AS DECIMAL(20,6))) AS DOUBLE) AS value
            FROM base GROUP BY 1),
    tot AS (SELECT CAST(SUM(CAST(v AS DECIMAL(20,6))) AS DOUBLE) * 0.001 AS threshold
            FROM base)
    SELECT partkey, value FROM val, tot WHERE value > threshold
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    base = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v"))
    )
    val = base.groupBy(F.col("l_partkey").alias("partkey")).agg(dsum(F.col("v"), "value"))
    tot = base.agg((dsum(F.col("v"), "t") * F.lit(0.001)).alias("threshold"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("value") > F.col("threshold"))
        .select("partkey", "value")
    )


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution — the canonical left outer
# join + double aggregation (per-customer count, then histogram of counts).
# ---------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    WITH co AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist FROM co GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    co = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 shape: top supplier by quarterly revenue — grouped revenue, then a
# broadcast 1-row max joined back (ties kept, matching the spec's view
# formulation).
# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(t["supplier"]), F.col("suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue — correlated per-part average
# quantity as a broadcast agg join (parts table is the small side even at
# 100 TB of lineitem).
# ---------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (SELECT l_partkey AS pk,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
                        / COUNT(*) AS DOUBLE) AS avgq
            FROM lineitem GROUP BY 1) a ON a.pk = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avgq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    avgq = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            (dsum(F.col("l_quantity"), "s") / F.count(F.lit(1)))
            .cast("double")
            .alias("avgq")
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].filter(F.col("p_brand") == "Brand#23")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avgq), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avgq"))
        .agg((dsum(F.col("l_extendedprice"), "s") / F.lit(7.0)).cast("double").alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume orders — HAVING on a grouped sum, then joined
# back to the order/customer detail.
# ---------------------------------------------------------------------------
@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(20,6))) > 300
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # Aggregate lineitem alone first (smallest shuffle: two columns keyed
    # by orderkey), filter to the rare heavy orders, THEN join detail.
    heavy = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        heavy.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


# ---------------------------------------------------------------------------
# Q22 shape: prospect customers — above-average balance (broadcast scalar)
# with no RECENT orders (anti join; every customer in this dataset has at
# least one historical order, so the spec's "no orders at all" would be
# vacuously empty), counted per nation.
# ---------------------------------------------------------------------------
@query(
    "q22_prospect_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE)
                  / COUNT(*) AS DOUBLE) AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name AS nation, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY 1
    """,
)
def q22_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg((dsum(F.col("c_acctbal"), "s") / F.count(F.lit(1))).cast("double").alias("ab"))
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 shape: late-shipment accounting by priority class. The schema has no
# shipmode/commit-date, so "late" is adapted to ship-lag > 60 days after
# the order date, classed into URGENT-ish vs other priorities.
# ---------------------------------------------------------------------------
@query(
    "q12_late_shipments",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS priority_class,
           COUNT(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 END)
             AS late_count,
           COUNT(*) AS total_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
            )
            .otherwise("low")
            .alias("priority_class")
        )
        .agg(
            F.count(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                )
            ).alias("late_count"),
            F.count(F.lit(1)).alias("total_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape: suppliers who shipped an above-average share of a part class —
# nested semi-join chain (part filter -> per-(supp,part) quantity vs the
# part's average -> distinct suppliers -> supplier detail).
# ---------------------------------------------------------------------------
@query(
    "q20_heavy_suppliers",
    oracle="""
    WITH target_parts AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS qty
      FROM lineitem JOIN target_parts ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    part_avg AS (
      SELECT l_partkey AS pk,
             CAST(CAST(SUM(CAST(qty AS DECIMAL(20,6))) AS DOUBLE)
                  / COUNT(*) AS DOUBLE) AS avg_qty
      FROM shipped GROUP BY 1
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM shipped
      JOIN part_avg ON pk = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE qty > 1.5 * avg_qty
    """,
)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    target = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    shipped = (
        t["lineitem"]
        .join(F.broadcast(target), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity"), "qty"))
    )
    # per-part average of the per-supplier sums; decimal re-accumulation of
    # the already-exact doubles keeps both engines identical
    part_avg = shipped.groupBy(F.col("l_partkey").alias("pk")).agg(
        (dsum(F.col("qty"), "s") / F.count(F.lit(1))).cast("double").alias("avg_qty")
    )
    return (
        shipped.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("pk"))
        .filter(F.col("qty") > 1.5 * F.col("avg_qty"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q21 shape: multi-EXISTS — customers with a returned ('R') lineitem on one
# order AND no returned lineitems on any later order (semi + anti join on
# correlated subqueries, the reference's hardest hand-written pattern).
# ---------------------------------------------------------------------------
@query(
    "q21_return_then_clean_customers",
    oracle="""
    WITH returned_orders AS (
      SELECT DISTINCT o_custkey, o_orderdate
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_returnflag = 'R'
    ),
    first_return AS (
      SELECT o_custkey AS ck, MIN(o_orderdate) AS first_ret
      FROM returned_orders GROUP BY 1
    ),
    later_return AS (
      SELECT r.o_custkey AS ck2
      FROM returned_orders r JOIN first_return f ON r.o_custkey = f.ck
      WHERE r.o_orderdate > f.first_ret
    )
    SELECT c_custkey, c_name
    FROM customer
      JOIN first_return ON c_custkey = ck
    WHERE c_custkey NOT IN (SELECT ck2 FROM later_return)
    """,
)
def q21_return_then_clean_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    returned = (
        t["orders"]
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .select("o_custkey", "o_orderdate")
        .distinct()
    )
    first_ret = returned.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min("o_orderdate").alias("first_ret")
    )
    later = (
        returned.join(first_ret, returned.o_custkey == first_ret.ck)
        .filter(F.col("o_orderdate") > F.col("first_ret"))
        .select(F.col("o_custkey").alias("ck2"))
        .distinct()
    )
    return (
        t["customer"]
        .join(first_ret, F.col("c_custkey") == F.col("ck"), "left_semi")
        .join(later, F.col("c_custkey") == F.col("ck2"), "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# Window-function extensions (beyond-reference §2.5: the reference has no
# window operator at all — users re-sorted inside reduce). Frames are
# explicit ROWS with a unique orderBy so both engines agree on peers.
# ---------------------------------------------------------------------------
@query(
    "window_cumulative_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS cum_revenue
    FROM orders
    """,
)
def window_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
        .over(w)
        .cast("double")
        .alias("cum_revenue"),
    )


@query(
    "window_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    """,
)
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("gap_days"),
    )


def _global_prefix(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    agg,
    py_fold,
    identity,
):
    """Shared two-pass range-partition prefix core (the ONE place the
    repartitionByRange + persist-pins-boundaries + driver-fold + local-
    window mechanics live; sum and max are thin wrappers):
      1. `repartitionByRange` on the order columns (sampled boundaries;
         partition id ascends with the sort key), persist — the persist
         pins the sampled boundaries so pass 2 sees the same partitions;
      2. fold ``value_col`` per range partition with ``agg`` (tiny
         driver-side collect, one row per partition), accumulate each
         partition's exclusive offset with ``py_fold`` from
         ``identity``;
      3. expose the partition-local exclusive window fold + the
         partition's offset for the wrapper to combine.
    Every task holds ~1/N of the rows — no single-partition exchange
    anywhere. Exactness does not depend on where the sampled boundaries
    land, only on the order columns being a total order.

    Returns (partitioned df incl. `_pid`, local exclusive-prefix
    Column, per-partition offset Column, grand fold over all rows).
    """
    from pyspark.sql.window import Window

    from disco_spark.session import default_parallelism

    nparts = default_parallelism(df.sparkSession)
    part = df.repartitionByRange(nparts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    part = lazy_persist(part)
    subs = sorted(
        part.groupBy("_pid").agg(agg(value_col).alias("v")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets, running = {}, identity
    for r in subs:
        offsets[r["_pid"]] = running
        running = py_fold(running, r["v"])
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(agg(value_col).over(w), F.lit(identity))
    return part, local, off[F.col("_pid")], running


def global_prefix_sum(
    df: DataFrame, order_cols: list[str], value_col: str, out: str = "start"
) -> tuple[DataFrame, int]:
    """Exact EXCLUSIVE prefix sum of ``value_col`` over the total order
    given by ``order_cols`` — WITHOUT a single-partition window (the
    naive `Window.orderBy(...)` serializes the whole table through one
    task — a straight OOM at 100TB). Thin wrapper over the shared
    `_global_prefix` core (offset combines by addition).

    This is the ONE shared two-pass harness: `global_row_number` is the
    value=1 special case, `global_prefix_max` the max sibling,
    `textops.packing` uses it for token offsets.

    Returns (df with `out` column, grand total).
    """
    import operator

    part, local, offset, total = _global_prefix(
        df, order_cols, value_col, F.sum, operator.add, 0
    )
    summed = part.withColumn(out, (local + offset).cast("long")).drop(
        "_pid"
    )
    return summed, total


def global_prefix_max(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out: str = "premax",
    identity: int = -(2**62),
) -> DataFrame:
    """Exact EXCLUSIVE prefix max of ``value_col`` over the total order
    given by ``order_cols`` — the max sibling of `global_prefix_sum`
    on the same `_global_prefix` core (offset combines by greatest).
    Rows with no predecessor see ``identity`` (must compare below
    every real value)."""
    part, local, offset, _running = _global_prefix(
        df, order_cols, value_col, F.max, max, identity
    )
    return part.withColumn(out, F.greatest(local, offset)).drop("_pid")


def global_row_number(df: DataFrame, cols: list[str], out: str = "rn") -> tuple[DataFrame, int]:
    """Exact global 1-based row number over a total order — the
    value=1 case of `global_prefix_sum` (a row's exclusive prefix count
    plus one IS its rank). Returns (df with `out`, total row count)."""
    ranked, total = global_prefix_sum(
        df.withColumn("__one", F.lit(1)), cols, "__one", out="__excl"
    )
    return (
        ranked.withColumn(out, (F.col("__excl") + 1).cast("long")).drop(
            "__one", "__excl"
        ),
        total,
    )


@query(
    "window_price_decile",
    oracle="""
    SELECT o_orderkey,
           NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
    FROM orders
    """,
)
def window_price_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE(10) with no single-partition exchange: exact global
    rank via range partitioning + per-partition offsets
    (`global_row_number`), then the decile in closed form from
    (rank, n) — NTILE semantics: the first n%10 buckets get one extra
    row. Survives 100x scale-up: every exchange in the plan is
    range- or hash-partitioned across all tasks."""
    t = load_tables(spark, sf_dir)
    ranked, n = global_row_number(
        t["orders"].select("o_orderkey", "o_totalprice"),
        ["o_totalprice", "o_orderkey"],
    )
    q, r = divmod(n, 10)
    if q == 0:  # fewer rows than buckets: ntile assigns rank directly
        decile = F.col("rn")
    else:
        head = r * (q + 1)  # rows covered by the (q+1)-sized buckets
        decile = F.when(
            F.col("rn") <= head, F.expr(f"(rn + {q}) DIV {q + 1}")
        ).otherwise(F.expr(f"{r} + ((rn - {head} + {q - 1}) DIV {q})"))
    return ranked.select("o_orderkey", decile.cast("int").alias("decile"))


@query(
    "bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketing as the co-location strategy (SURVEY §1.3/§2.6: the
    DiscoDB sorted-layout analog): lineitem and orders are saved
    bucketed+sorted on the join key, and the fact-fact join then plans
    with NO Exchange on either side — asserted on the executed plan, not
    just claimed. At 100 TB this removes the dominant shuffle of every
    recurring fact-fact join; the one-time bucketed write is the
    amortized cost. Broadcast is disabled around the probe so the
    assertion exercises the sort-merge path the big-data case takes."""
    import os as _os
    import shutil as _shutil

    t = load_tables(spark, sf_dir)
    tag = _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    names = {}
    for name, df in (
        ("lineitem", t["lineitem"].select("l_orderkey", "l_quantity")),
        ("orders", t["orders"].select("o_orderkey", "o_orderpriority")),
    ):
        tbl = f"bkt_{name}_{tag}"
        names[name] = tbl
        if not spark.catalog.tableExists(tbl):
            # a previous SESSION's managed-table location may survive on
            # disk without a catalog entry (the in-memory catalog dies
            # with the session) — saveAsTable then refuses even in
            # overwrite mode; drop the stale directory first
            _shutil.rmtree(_os.path.join(warehouse, tbl), ignore_errors=True)
            key = "l_orderkey" if name == "lineitem" else "o_orderkey"
            df.write.mode("overwrite").bucketBy(8, key).sortBy(key).saveAsTable(tbl)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, od = spark.table(names["lineitem"]), spark.table(names["orders"])
        joined = li.join(od, li.l_orderkey == od.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_quantity"), "sum_qty"),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# --------------------------------------------------------------------------
# pivot (wide reshaping — the report-facing complement of rollup/cube)
# --------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


@query(
    "pivot_orders_status_by_priority",
    oracle="""
    SELECT o_orderstatus AS status, {cols}
    FROM orders GROUP BY 1
    """.format(
        cols=", ".join(
            f"CAST(COUNT(CASE WHEN o_orderpriority = '{v}' THEN 1 END) AS BIGINT)"
            f" AS {c}"
            for v, c in zip(_PRIORITIES, _PRIORITY_COLS)
        )
    ),
)
def pivot_orders_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts as a status x priority matrix — PIVOT, the
    report-facing reshape (rollup/cube produce long-format groupings;
    dashboards want the wide matrix). The pivot values are passed
    EXPLICITLY: without them Spark first runs a blocking distinct job
    over the pivot column to discover values — an extra full scan, and
    a footgun at 100 TB if the column has unbounded cardinality.
    Explicit values make the plan a single partial/final aggregation
    with one CASE branch per output column, exactly what the oracle
    writes by hand."""
    t = load_tables(spark, sf_dir)
    wide = (
        t["orders"]
        .groupBy(F.col("o_orderstatus").alias("status"))
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renamed = wide.select(
        "status",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("bigint").alias(c)
            for v, c in zip(_PRIORITIES, _PRIORITY_COLS)
        ],
    )
    return renamed


@query(
    "cohort_orders_retention",
    # classic cohort grid: customers grouped by FIRST-order month,
    # activity counted by months-since-first (integer month arithmetic
    # both engines: 12*year + month)
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(12 * EXTRACT(YEAR FROM o_orderdate)
                 + EXTRACT(MONTH FROM o_orderdate)) AS first_m
      FROM orders GROUP BY 1
    ),
    activity AS (
      SELECT o.o_custkey, f.first_m,
             (12 * EXTRACT(YEAR FROM o.o_orderdate)
              + EXTRACT(MONTH FROM o.o_orderdate)) - f.first_m AS months_since
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT CAST(first_m AS BIGINT) AS cohort_m,
           CAST(months_since AS BIGINT) AS months_since,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers
    FROM activity
    WHERE months_since <= 12
    GROUP BY 1, 2
    """,
)
def cohort_orders_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort grid over orders: customers bucketed by their
    FIRST order month (cohort_m = 12*year + month — pure integer
    arithmetic, no date-diff semantics for engines to disagree about),
    distinct active customers counted at each months-since-first offset
    up to a year. Two shuffles: the per-customer first-order aggregate
    and the (cohort, offset) distinct count; the first-order side joins
    back by customer key (AQE broadcasts it when small)."""
    t = load_tables(spark, sf_dir)
    m = 12 * F.year("o_orderdate") + F.month("o_orderdate")
    o = t["orders"].select("o_custkey", m.alias("m"))
    firsts = o.groupBy("o_custkey").agg(F.min("m").alias("first_m"))
    activity = o.join(firsts, "o_custkey").select(
        "o_custkey",
        F.col("first_m"),
        (F.col("m") - F.col("first_m")).alias("months_since"),
    )
    return (
        activity.filter(F.col("months_since") <= 12)
        .groupBy(
            F.col("first_m").cast("bigint").alias("cohort_m"),
            F.col("months_since").cast("bigint").alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


@query(
    "window_rolling_30d_revenue",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day, o_totalprice
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6)))
                OVER (PARTITION BY o_custkey ORDER BY day
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS rev_30d
    FROM o
    """,
)
def window_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day revenue per customer at each order — the
    VALUE-RANGE frame the ROWS-frame queries above can't express
    (peers are picked by time distance, not row position: orders on
    the same day aggregate together on both engines by definition, so
    no tie-break column is needed or allowed — RANGE frames require a
    single numeric ORDER BY key). The key is DAYS since epoch via
    datediff: o_orderdate is date-valued, and day arithmetic is
    timezone-free — an epoch-seconds key would read NTZ timestamps
    through the session timezone, which the driver's vanilla session
    does not pin to UTC.

    Scale: one hash Exchange on o_custkey; the frame is evaluated by
    the same sorted-window pass as any cumulative sum (Spark keeps a
    sliding aggregate over the sorted partition — no per-row rescans).
    The decimal cast keeps the sliding SUM exact, so add/evict order
    inside the frame can't produce float drift between engines."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    o = t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
        "o_totalprice",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
        .over(w)
        .cast("double")
        .alias("rev_30d"),
    )


@query(
    "pareto_abc_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS p_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(rev_cents) AS t FROM rev),
    cum AS (
      SELECT p_partkey, rev_cents,
             SUM(rev_cents) OVER (
               ORDER BY rev_cents DESC, p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM rev
    )
    SELECT p_partkey,
           CAST(rev_cents AS DOUBLE) / 100 AS revenue,
           CASE WHEN CAST(c AS DOUBLE) / t <= 0.8 THEN 'A'
                WHEN CAST(c AS DOUBLE) / t <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum CROSS JOIN tot
    """,
)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: 'A' = parts
    covering the first 80% of cumulative revenue (ranked descending),
    'B' the next 15%, 'C' the tail — the classic inventory-priority
    cut, and the same shape as a corpus "which sources carry 80% of
    tokens" audit.

    Revenue accumulates as exact integer CENTS (per-row ROUND before
    the cast — Spark truncates double->bigint where DuckDB rounds, so
    the ROUND is load-bearing), making every cumulative share a ratio
    of exact integers. The global cumulative sum runs through the
    shared two-pass range-partition harness (global_prefix_sum) — NO
    single-partition window, every task holds ~1/N of the parts — and
    the descending order is expressed as an ascending sort on the
    NEGATED cents (the harness range-partitions on ascending keys).
    Class boundaries compare exact-integer ratios in double: identical
    operands on both engines, deterministic."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("rev_cents")
        )
        .withColumn("neg_cents", -F.col("rev_cents"))
    )
    cum, total = global_prefix_sum(
        rev, ["neg_cents", "p_partkey"], "rev_cents", out="cum_before"
    )
    share = (F.col("cum_before") + F.col("rev_cents")).cast("double") / F.lit(
        float(total)
    )
    return cum.select(
        "p_partkey",
        (F.col("rev_cents").cast("double") / 100).alias("revenue"),
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "orders_cohort_ltv",
    # cumulative revenue per cohort customer by months-since-first —
    # the money sibling of the retention grid (cohort windows are
    # calendar-bounded: <= 13 rows per cohort partition)
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(12 * EXTRACT(YEAR FROM o_orderdate)
                 + EXTRACT(MONTH FROM o_orderdate)) AS first_m
      FROM orders GROUP BY 1
    ),
    sizes AS (
      SELECT first_m, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
    ),
    monthly AS (
      SELECT f.first_m,
             (12 * EXTRACT(YEAR FROM o.o_orderdate)
              + EXTRACT(MONTH FROM o.o_orderdate)) - f.first_m
               AS months_since,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(m.first_m AS BIGINT) AS cohort_m,
           CAST(m.months_since AS BIGINT) AS months_since,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           ROUND(CAST(SUM(m.cents) OVER (
                   PARTITION BY m.first_m ORDER BY m.months_since
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 100 / s.cohort_size, 6)
             AS cum_ltv_per_customer
    FROM monthly m JOIN sizes s ON s.first_m = m.first_m
    WHERE m.months_since <= 12
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime value per cohort customer: cohorts by first
    order month, exact-cents revenue accumulated over months-since-
    first (<= 12) and normalized by cohort size — the LTV curve every
    payback-period model reads off. The money sibling of
    cohort_orders_retention (same integer month arithmetic).

    The running sum partitions by cohort over <= 13 month rows —
    calendar-bounded, so a per-cohort window is the right plan (the
    grain table, not the order volume, bounds window size)."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    m = 12 * F.year("o_orderdate") + F.month("o_orderdate")
    o = t["orders"].select(
        "o_custkey",
        m.alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("m").alias("first_m"))
    sizes = firsts.groupBy("first_m").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    monthly = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "first_m", (F.col("m") - F.col("first_m")).alias("months_since")
        )
        .agg(F.sum("cents").alias("cents"))
    )
    w = (
        Window.partitionBy("first_m")
        .orderBy("months_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        monthly.filter(F.col("months_since") <= 12)
        .join(F.broadcast(sizes), "first_m")
        .select(
            F.col("first_m").cast("bigint").alias("cohort_m"),
            F.col("months_since").cast("bigint").alias("months_since"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.round(
                F.sum("cents").over(w).cast("double")
                / 100
                / F.col("cohort_size"),
                6,
            ).alias("cum_ltv_per_customer"),
        )
    )
