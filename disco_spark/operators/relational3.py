"""Frontier / segmentation relational operators: 2-D skyline, free-form
GROUPING SETS, RFM customer quartiles, and day-of-month activity
bitmaps.

Beyond-reference relational surface (the reference stops at
reduce-style aggregation, SURVEY §2.3/§2.5); each query here is a
classic warehouse ask re-expressed scale-first:

- skyline: the Pareto frontier via the shared two-pass prefix-MAX
  harness (relational2.global_prefix_max) — never the quadratic
  NOT EXISTS self-join the naive SQL implies (that stays oracle-side
  only, where DuckDB runs it on sf0.01).
- grouping sets: Catalyst's native Expand — one scan serves all four
  grouping combinations.
- RFM: three exact global ranks via the two-pass row-number harness
  (no single-partition ntile window), quartile index derived by
  integer arithmetic so both engines agree exactly.
- activity bitmaps: per-user day-of-month presence packed into one
  BIGINT by bit_or — the roaring-bitmap-style rollup shape: bounded
  state per key, mergeable, popcount-served.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from disco_spark.operators.relational2 import (
    global_prefix_max,
    global_row_number,
)
from disco_spark.registry import query
from disco_spark.session import lazy_persist, load_tables


@query(
    "skyline_parts_price_size",
    # oracle: the literal non-domination definition (quadratic NOT
    # EXISTS — fine for DuckDB at sf0.01; the engine plan is the
    # two-pass prefix-max, never this self-join)
    oracle="""
    SELECT q.p_partkey, q.p_retailprice, q.p_size
    FROM part q
    WHERE NOT EXISTS (
      SELECT 1 FROM part p
      WHERE p.p_retailprice <= q.p_retailprice
        AND p.p_size >= q.p_size
        AND (p.p_retailprice < q.p_retailprice OR p.p_size > q.p_size)
    )
    """,
)
def skyline_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: minimize p_retailprice, maximize
    p_size — every part no other part dominates (cheaper-or-equal AND
    bigger-or-equal with one strict). The classic skyline operator.

    Plan: dedup to distinct (price, size) points, then one exclusive
    prefix-max of size over the total order (price asc, size desc) —
    a point is on the skyline iff every strictly-preceding point (all
    cheaper, or same-price-and-bigger) has smaller size. The prefix max
    runs through the shared two-pass range-partition harness (every
    task holds ~1/N of the points; no single-partition window, no
    n^2 join). Skyline points broadcast back onto the part table —
    the frontier of n random 2-D points is O(log n) expected."""
    part = load_tables(spark, sf_dir)["part"]
    pts = (
        part.select("p_retailprice", "p_size")
        .distinct()
        .withColumn("neg_size", -F.col("p_size"))
    )
    m = global_prefix_max(
        pts, ["p_retailprice", "neg_size"], "p_size", out="premax"
    )
    sky = m.filter(F.col("premax") < F.col("p_size")).select(
        "p_retailprice", "p_size"
    )
    return part.join(
        F.broadcast(sky), ["p_retailprice", "p_size"]
    ).select("p_partkey", "p_retailprice", "p_size")


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(2 * GROUPING(o_orderstatus)
                + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-form GROUPING SETS — the general form rollup/cube
    specialize (rollup_orders_by_status_priority,
    cube_orders_by_status_priority are the fixed-lattice siblings):
    (status, priority), (status), (priority), and grand total in ONE
    scan via Catalyst's Expand, with the 2*g(status)+g(priority) id
    distinguishing NULL-as-total from NULL-as-value rows.

    Scale: Expand replicates each row once per grouping set before the
    partial aggregate — 4x map-side rows but a single shuffle whose
    cardinality is the union of the four grouped outputs (tiny)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(2 * grouping(o_orderstatus)
                    + grouping(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )


# quartile index from an exact global rank: ceil(4*rn/n) via integer
# arithmetic — identical in both engines, no float, no builtin ntile
# (whose remainder distribution differs from this formula; we define
# the quartile ONCE as this expression and replay it oracle-side)
def _quartile(rn: str, n: int):
    return ((4 * F.col(rn) + n - 1) / n).cast("bigint")


def _quartile_sql(order_by: str, n_sql: str = "COUNT(*) OVER ()") -> str:
    return (
        f"(4 * ROW_NUMBER() OVER (ORDER BY {order_by}) + {n_sql} - 1) "
        f"// {n_sql}"
    )


@query(
    "rfm_customer_segments",
    oracle=f"""
    WITH anchor AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    base AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate), (SELECT maxd FROM anchor))
               AS recency_days,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, recency_days, n_orders, monetary_cents,
             {_quartile_sql("recency_days, o_custkey")} AS r_q,
             {_quartile_sql("n_orders DESC, o_custkey")} AS f_q,
             {_quartile_sql("monetary_cents DESC, o_custkey")} AS m_q
      FROM base
    )
    SELECT o_custkey, recency_days, n_orders,
           CAST(monetary_cents AS DOUBLE) / 100 AS monetary,
           r_q, f_q, m_q,
           CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
             || CAST(m_q AS VARCHAR) AS segment
    FROM scored
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per ordering customer, quartile scores for
    Recency (days since last order, 1 = most recent), Frequency
    (order count, 1 = most frequent) and Monetary (lifetime spend,
    1 = top spend), concatenated into the classic '111'-style segment.

    Each quartile needs an exact GLOBAL rank; all three run through the
    two-pass range-partition row-number harness (global_row_number) —
    no single-partition ntile window anywhere. Monetary accumulates as
    exact integer cents (per-row ROUND before the bigint cast); the
    quartile index is pure integer arithmetic on (rank, n)."""
    o = load_tables(spark, sf_dir)["orders"]
    anchor = F.broadcast(o.agg(F.max("o_orderdate").alias("maxd")))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("monetary_cents"),
        )
        .crossJoin(anchor)
        .withColumn(
            "recency_days", F.datediff(F.col("maxd"), F.col("last_order"))
        )
        .drop("maxd", "last_order")
    )
    r, n = global_row_number(
        base.withColumn("neg_f", -F.col("n_orders")).withColumn(
            "neg_m", -F.col("monetary_cents")
        ),
        ["recency_days", "o_custkey"],
    )
    r = r.withColumn("r_q", _quartile("rn", n)).drop("rn")
    r, _ = global_row_number(r, ["neg_f", "o_custkey"])
    r = r.withColumn("f_q", _quartile("rn", n)).drop("rn")
    r, _ = global_row_number(r, ["neg_m", "o_custkey"])
    r = r.withColumn("m_q", _quartile("rn", n)).drop("rn", "neg_f", "neg_m")
    return r.select(
        "o_custkey",
        "recency_days",
        "n_orders",
        (F.col("monetary_cents").cast("double") / 100).alias("monetary"),
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("segment"),
    )


@query(
    "bitmap_user_active_days",
    oracle="""
    WITH d AS (
      SELECT user_id, day(ts) AS dom FROM events
    )
    SELECT user_id,
           bit_or(CAST(1 AS BIGINT) << (dom - 1)) AS day_bitmap,
           CAST(bit_count(bit_or(CAST(1 AS BIGINT) << (dom - 1)))
                AS INTEGER) AS n_active_days,
           MIN(dom) AS first_dom, MAX(dom) AS last_dom
    FROM d GROUP BY user_id
    """,
)
def bitmap_user_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-month activity bitmap per user: one BIGINT with bit
    (d-1) set iff the user fired an event on calendar day d, plus its
    popcount — the roaring-bitmap-style presence rollup. The engine-
    side point at 100 TB: per-user state is a FIXED 8 bytes regardless
    of event volume, bit_or is associative/commutative (map-side
    partial merge), and popcount-style audiences ("active >= 20 days")
    are served without touching raw events again."""
    ev = load_tables(spark, sf_dir)["events"]
    # F.shiftleft only takes a literal shift; the SQL form shifts by a
    # per-row column
    bit = F.expr("shiftleft(cast(1 as bigint), dayofmonth(ts) - 1)")
    return (
        ev.select("user_id", F.dayofmonth("ts").alias("dom"), bit.alias("b"))
        .groupBy("user_id")
        .agg(
            F.bit_or("b").alias("day_bitmap"),
            F.bit_count(F.bit_or("b")).alias("n_active_days"),
            F.min("dom").alias("first_dom"),
            F.max("dom").alias("last_dom"),
        )
    )


@query(
    "unpivot_lineitem_measures",
    # wide -> long reshape: one row per (orderkey-grain measure); the
    # inverse of pivot_orders_status_by_priority. Oracle stacks via
    # UNION ALL — same multiset, engine-syntax-free.
    oracle="""
    WITH long AS (
      SELECT 'quantity' AS measure, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'tax', l_tax FROM lineitem
    )
    SELECT measure, COUNT(*) AS n,
           CAST(SUM(CAST(v AS DECIMAL(20,6))) AS DOUBLE) AS total,
           MIN(v) AS min_v, MAX(v) AS max_v
    FROM long GROUP BY measure
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the four lineitem measures reshaped wide->long
    in ONE scan via `stack` (Catalyst Generate — the inverse of the
    pivot query), then per-measure decimal-exact stats. The reshape
    every metrics store ingest runs; at scale the long table is 4x
    rows but the aggregate folds map-side to 4 groups before any
    shuffle."""
    li = load_tables(spark, sf_dir)["lineitem"]
    long = li.select(
        F.expr(
            "stack(4, 'quantity', l_quantity, "
            "'extendedprice', l_extendedprice, "
            "'discount', l_discount, 'tax', l_tax) AS (measure, v)"
        )
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(20,6)")).cast("double").alias(
            "total"
        ),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


@query(
    "gini_supplier_revenue",
    # Gini = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over revenues
    # sorted ascending with exact global ranks; everything integer
    # until the final rounded ratio (DECIMAL(38,0) folds guard the
    # rank-weighted sum, which is the one product that CAN outgrow
    # BIGINT at scale)
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, l_suppkey) AS i
      FROM rev
    ),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(cents AS DECIMAL(38,0))) AS sx,
             SUM(CAST(i AS DECIMAL(38,0)) * cents) AS six
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_suppliers,
           CAST(sx AS DOUBLE) / 100 AS total_revenue,
           ROUND(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                 / CAST(n * sx AS DOUBLE), 6) AS gini
    FROM s
    """,
)
def gini_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across suppliers —
    the single-number inequality metric behind the Pareto/ABC cut
    (pareto_abc_parts answers "who is the top 80%", this answers "how
    concentrated is the whole distribution"; 0 = equal, ->1 =
    winner-take-all).

    Exact global ranks come from the shared two-pass row-number
    harness (ascending cents, suppkey tie-break — no single-partition
    window); the rank-weighted sum folds in DECIMAL(38,0) (rank x
    cents products outgrow BIGINT long before a 100 TB lineitem does).
    One row out."""
    li = load_tables(spark, sf_dir)["lineitem"]
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        ).alias("cents")
    )
    ranked, n = global_row_number(rev, ["cents", "l_suppkey"], out="i")
    s = ranked.agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias(
            "six"
        ),
    )
    return s.select(
        F.lit(n).cast("bigint").alias("n_suppliers"),
        (F.col("sx").cast("double") / 100).alias("total_revenue"),
        F.round(
            (2 * F.col("six") - (n + 1) * F.col("sx")).cast("double")
            / (F.lit(n) * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
    )


@query(
    "nation_supplier_roster",
    # ordered string aggregation: top-3 suppliers per nation by
    # account balance, joined into one deterministic roster string —
    # LISTAGG/string_agg(ORDER BY) parity
    oracle="""
    WITH ranked AS (
      SELECT n.n_name, s.s_name, s.s_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY n.n_name
               ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rnk,
             COUNT(*) OVER (PARTITION BY n.n_name) AS n_suppliers
      FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    )
    SELECT n_name,
           CAST(MAX(n_suppliers) AS BIGINT) AS n_suppliers,
           string_agg(s_name, ',' ORDER BY rnk) AS roster
    FROM ranked WHERE rnk <= 3
    GROUP BY n_name
    """,
)
def nation_supplier_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg(ORDER BY)
    parity): each nation's top-3 suppliers by account balance,
    concatenated in rank order into one roster string. collect_list is
    order-nondeterministic under shuffle, so the plan collects
    (rank, name) STRUCTS and sorts the array before joining — the only
    way to make distributed string aggregation deterministic.

    Nation dim broadcasts onto suppliers; the rank window and both
    folds share one s_nationkey-grained Exchange; rosters are bounded
    at 3 names per group."""
    t = load_tables(spark, sf_dir)
    s = t["supplier"].join(
        F.broadcast(t["nation"]),
        F.col("n_nationkey") == F.col("s_nationkey"),
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    wall = Window.partitionBy("n_name")
    ranked = s.withColumn("rnk", F.row_number().over(w)).withColumn(
        "n_suppliers", F.count(F.lit(1)).over(wall)
    )
    top = ranked.filter(F.col("rnk") <= 3)
    return top.groupBy("n_name").agg(
        F.max("n_suppliers").cast("bigint").alias("n_suppliers"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rnk"), F.col("s_name")))
                ),
                lambda x: x["s_name"],
            ),
            ",",
        ).alias("roster"),
    )


ECDF_PROBES = (50_000, 150_000, 300_000)


@query(
    "orders_value_ecdf",
    # empirical CDF at fixed value probes per priority: one scan of
    # conditional counts, stacked wide->long
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority, COUNT(*) AS n,
             {", ".join(
                 f"CAST(SUM(CASE WHEN o_totalprice <= {p} THEN 1 ELSE 0 END) AS BIGINT) AS b{i}"
                 for i, p in enumerate(ECDF_PROBES))}
      FROM orders GROUP BY 1
    ),
    long AS (
      {" UNION ALL ".join(
          f"SELECT o_orderpriority, {p} AS probe, b{i} AS n_below, n FROM c"
          for i, p in enumerate(ECDF_PROBES))}
    )
    SELECT o_orderpriority, probe, n_below,
           ROUND(CAST(n_below AS DOUBLE) / n, 6) AS cdf
    FROM long
    """,
)
def orders_value_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical CDF of order value at fixed probes per priority
    (share of orders at-or-under 50k / 150k / 300k) — the
    SLA-style "what fraction clears threshold X" report. One scan of
    conditional aggregates (map-side partials, 5-group shuffle), then
    a constant-width stack to long form; the probes never replicate
    the input rows."""
    o = load_tables(spark, sf_dir)["orders"]
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum((F.col("o_totalprice") <= p).cast("int"))
        .cast("bigint")
        .alias(f"b{i}")
        for i, p in enumerate(ECDF_PROBES)
    ]
    c = o.groupBy("o_orderpriority").agg(*aggs)
    stack = ", ".join(
        f"{p}L, b{i}" for i, p in enumerate(ECDF_PROBES)
    )
    long = c.select(
        "o_orderpriority",
        "n",
        F.expr(
            f"stack({len(ECDF_PROBES)}, {stack}) AS (probe, n_below)"
        ),
    )
    return long.select(
        "o_orderpriority",
        "probe",
        "n_below",
        F.round(F.col("n_below").cast("double") / F.col("n"), 6).alias(
            "cdf"
        ),
    )


@query(
    "heatmap_qty_price_bins",
    # 2-D histogram: quantity in 10 fixed-width bins x price in $10k
    # bins capped at 9 — pure integer bin arithmetic both engines
    oracle="""
    WITH b AS (
      SELECT (CAST(l_quantity AS BIGINT) - 1) // 5 AS bin_q,
             LEAST(9, CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      // 1000000) AS bin_p,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS rev_cents
      FROM lineitem
    )
    SELECT bin_q, bin_p, COUNT(*) AS n,
           CAST(SUM(rev_cents) AS DOUBLE) / 100 AS revenue
    FROM b GROUP BY 1, 2
    """,
)
def heatmap_qty_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (heatmap) of lineitem quantity x price: quantity
    in ten 5-unit bins, price in $10k bins capped at the 9th — the
    density grid behind every scatter-replacement heatmap at volumes
    where plotting raw points is impossible. One scan, one shuffle of
    at most 100 (bin, partial) cells; bin indexes are pure integer
    arithmetic (the cents ROUND happens before any cast, per the
    cross-engine rule)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    pc = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    b = li.select(
        ((F.col("l_quantity").cast("bigint") - 1) / 5)
        .cast("bigint")
        .alias("bin_q"),
        F.least(F.lit(9).cast("bigint"), (pc / 1000000).cast("bigint")).alias(
            "bin_p"
        ),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("bigint")
        .alias("rev_cents"),
    )
    return b.groupBy("bin_q", "bin_p").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("rev_cents").cast("double") / 100).alias("revenue"),
    )


@query(
    "order_basket_structs",
    # oracle replays the array semantics RELATIONALLY (window + agg) —
    # a genuine cross-model check: engine-side arrays of structs vs
    # oracle-side ranked rows must agree exactly
    oracle="""
    WITH x AS (
      SELECT l_orderkey, l_partkey,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    top AS (
      SELECT l_orderkey, l_partkey AS top_partkey, qty AS top_qty
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY l_orderkey ORDER BY qty DESC, l_partkey DESC
        ) AS rnk FROM x
      ) WHERE rnk = 1
    )
    SELECT x.l_orderkey,
           COUNT(*) AS n_items,
           CAST(SUM(x.qty) AS BIGINT) AS total_qty,
           MAX(top.top_partkey) AS top_partkey,
           MAX(top.top_qty) AS top_qty
    FROM x JOIN top USING (l_orderkey)
    GROUP BY x.l_orderkey
    """,
)
def order_basket_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data basket construction: each order's lineitems fold
    into an ARRAY OF STRUCTS (qty, partkey), then JVM higher-order
    functions read it back out — size, aggregate() for the quantity
    total, element_at(sorted, -1) for the top item (max qty, partkey
    as tie-break). The pattern every feature store uses to ship
    per-entity nested features in one row; everything stays in
    whole-stage codegen, no explode-back, no Python.

    The oracle computes the same answers relationally (rank window +
    grouped sums) — engine arrays and oracle rows must agree
    exactly."""
    li = load_tables(spark, sf_dir)["lineitem"]
    basket = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_quantity").cast("bigint").alias("qty"),
                    F.col("l_partkey").alias("pk"),
                )
            )
        ).alias("basket")
    )
    top = F.element_at(F.col("basket"), -1)
    return basket.select(
        "l_orderkey",
        F.size("basket").cast("bigint").alias("n_items"),
        F.aggregate(
            F.col("basket"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x["qty"],
        ).alias("total_qty"),
        top["pk"].alias("top_partkey"),
        top["qty"].alias("top_qty"),
    )


@query(
    "window_percent_rank_prices",
    # percent_rank + cume_dist per priority — the two normalized-rank
    # window functions the decile/row_number family doesn't cover.
    # Ties resolve identically in both engines because the order key
    # (cents, orderkey) is a total order.
    oracle="""
    WITH x AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderpriority, o_orderkey,
           CAST(cents AS DOUBLE) / 100 AS price,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cum_dist
    FROM x WINDOW w AS (
      PARTITION BY o_orderpriority ORDER BY cents, o_orderkey)
    """,
)
def window_percent_rank_prices(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Normalized rank positions per order priority: percent_rank
    ((rank-1)/(n-1)) and cume_dist (peers-at-or-below / n) over the
    exact-cents price order — the "where does this order sit in its
    class" score pair, covering the two normalized window functions
    the decile/ntile family doesn't.

    One Exchange on o_orderpriority; the order key (cents, orderkey)
    is a total order, so ranks and peer groups are engine-identical.
    Both statistics are ratios of exact integers rounded to 6."""
    o = load_tables(spark, sf_dir)["orders"]
    x = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    return x.select(
        "o_orderpriority",
        "o_orderkey",
        (F.col("cents").cast("double") / 100).alias("price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@query(
    "weighted_median_price_by_priority",
    # quantity-weighted median lineitem price per priority: smallest
    # price whose running weight reaches half the total — exact
    # integer weights, total-order key, no interpolation
    oracle="""
    WITH x AS (
      SELECT o.o_orderpriority,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l.l_quantity AS BIGINT) AS wt,
             l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    run AS (
      SELECT o_orderpriority, cents, wt,
             SUM(wt) OVER (
               PARTITION BY o_orderpriority
               ORDER BY cents, l_orderkey, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum,
             SUM(wt) OVER (PARTITION BY o_orderpriority) AS tot
      FROM x
    )
    SELECT o_orderpriority,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN cents END) AS DOUBLE)
             / 100 AS weighted_median_price,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM run GROUP BY o_orderpriority
    """,
)
def weighted_median_price_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantity-weighted median lineitem price per order priority: the
    smallest price at which the running quantity reaches half the
    group's total — the inventory-weighted "typical price" (a plain
    median over-weights one-unit lines). Exact integer weights over a
    total order (cents, orderkey, partkey), so the cut row is
    engine-identical; no interpolation.

    One Exchange on o_orderpriority serves both windows and the final
    fold."""
    t = load_tables(spark, sf_dir)
    x = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        "o_orderpriority",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias(
            "cents"
        ),
        F.col("l_quantity").cast("bigint").alias("wt"),
        "l_orderkey",
        "l_partkey",
    )
    wrun = (
        Window.partitionBy("o_orderpriority")
        .orderBy("cents", "l_orderkey", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("o_orderpriority")
    run = x.withColumn("cum", F.sum("wt").over(wrun)).withColumn(
        "tot", F.sum("wt").over(wall)
    )
    return run.groupBy("o_orderpriority").agg(
        (
            F.min(
                F.when(2 * F.col("cum") >= F.col("tot"), F.col("cents"))
            ).cast("double")
            / 100
        ).alias("weighted_median_price"),
        F.max("tot").cast("bigint").alias("total_weight"),
    )


@query(
    "nation_trade_matrix",
    # full supplier-nation x customer-nation revenue flow matrix (the
    # all-pairs generalization of the q7 two-nation corridor), with
    # each cell's share of total trade
    oracle="""
    WITH flows AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(cents) AS t FROM flows)
    SELECT supp_nation, cust_nation,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           ROUND(CAST(cents AS DOUBLE) / tot.t, 6) AS share
    FROM flows CROSS JOIN tot
    """,
)
def nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full nation-to-nation trade matrix: revenue flowing from every
    supplier nation to every customer nation (the all-pairs
    generalization of q7's two-nation corridor) with each cell's share
    of total trade — the chord-diagram / trade-balance input.

    One fact-fact join on orderkey, both nation lookups broadcast; the
    output is at most |nations|^2 cells and the total rides along as a
    lazy broadcast 1-row aggregate. Exact integer cents throughout."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("snk"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("cnk"),
        F.col("n_name").alias("cust_nation"),
    )
    flows = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cnk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                ).cast("bigint")
            ).alias("cents")
        )
    )
    tot = F.broadcast(flows.agg(F.sum("cents").alias("t")))
    return flows.crossJoin(tot).select(
        "supp_nation",
        "cust_nation",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        F.round(F.col("cents").cast("double") / F.col("t"), 6).alias(
            "share"
        ),
    )


@query(
    "part_supplier_redundancy",
    # supply-chain redundancy: how many parts have 1, 2, 3... distinct
    # suppliers — the single-source-of-failure audit
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    per_part AS (
      SELECT l_partkey, COUNT(*) AS n_suppliers FROM ps GROUP BY 1
    )
    SELECT n_suppliers, COUNT(*) AS n_parts
    FROM per_part GROUP BY n_suppliers
    """,
)
def part_supplier_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-redundancy histogram: for each part, how many distinct
    suppliers have actually shipped it, folded to (n_suppliers,
    n_parts) — the single-source-risk audit (n_suppliers = 1 rows are
    the fragile tail). Two grouped aggregates over the deduped
    (part, supplier) pairs; the dedup shuffle moves two int columns
    only."""
    li = load_tables(spark, sf_dir)["lineitem"]
    ps = li.select("l_partkey", "l_suppkey").distinct()
    per_part = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return per_part.groupBy("n_suppliers").agg(
        F.count(F.lit(1)).alias("n_parts")
    )


# ---------------------------------------------------------------------------
# Theil T inequality with between/within-nation decomposition — the
# additively-decomposable sibling of gini_supplier_revenue: the Gini
# says HOW concentrated supplier revenue is, the Theil decomposition
# says WHERE (between national markets, or among suppliers inside
# them). T_total = (1/n) sum (x/mu) ln(x/mu); T_between uses group
# means; T_within = T_total - T_between (exact additivity of Theil T).
# ---------------------------------------------------------------------------
_THEIL_REV_CTE = """
    rev AS (
      SELECT s.s_nationkey AS nk,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem JOIN supplier s ON s.s_suppkey = l_suppkey
      GROUP BY l_suppkey, s.s_nationkey
    )"""


@query(
    "theil_supplier_nation_decomposition",
    oracle=f"""
    WITH {_THEIL_REV_CTE},
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx
      FROM rev
    ),
    t_tot AS (
      SELECT SUM(CAST(
               (CAST(rev.cents AS DOUBLE) * tot.n / tot.sx)
               * ln(CAST(rev.cents AS DOUBLE) * tot.n / tot.sx)
             AS DECIMAL(28,15))) AS tsum
      FROM rev, tot WHERE rev.cents > 0
    ),
    grp AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(cents) AS BIGINT) AS sg
      FROM rev GROUP BY 1
    ),
    t_btw AS (
      SELECT SUM(CAST(
               (CAST(grp.sg AS DOUBLE) / tot.sx)
               * ln((CAST(grp.sg AS DOUBLE) * tot.n)
                    / (CAST(tot.sx AS DOUBLE) * grp.ng))
             AS DECIMAL(28,15))) AS bsum
      FROM grp, tot WHERE grp.sg > 0
    )
    SELECT tot.n AS n_suppliers,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM grp) AS n_nations,
           ROUND(CAST(t_tot.tsum AS DOUBLE) / tot.n, 6) AS theil_total,
           ROUND(CAST(t_btw.bsum AS DOUBLE), 6) AS theil_between,
           ROUND(CAST(t_tot.tsum AS DOUBLE) / tot.n
                 - CAST(t_btw.bsum AS DOUBLE), 6) AS theil_within,
           CASE WHEN t_tot.tsum <> 0
                THEN ROUND(CAST(t_btw.bsum AS DOUBLE)
                           / (CAST(t_tot.tsum AS DOUBLE) / tot.n), 6)
                ELSE 0 END AS between_share
    FROM tot, t_tot, t_btw
    """,
)
def theil_supplier_nation_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theil T index of supplier revenue inequality, decomposed into
    between-nation and within-nation components (T is the inequality
    measure that decomposes ADDITIVELY — Gini does not). Income share
    ratios x*n/sx and group terms (sg/sx)*ln((sg*n)/(sx*ng)) are
    doubles over exact integer cents/counts, each term
    DECIMAL(28,15)-accumulated (order-independent, the entropy-query
    pattern); T_within falls out by exact additivity.

    Plan: one lineitem->supplier join + per-supplier groupBy; totals
    and group sums ride as lazy 1-row/25-row cross-joined aggregates
    (no driver collect); both term folds are constant-size. On this
    uniform synthetic data between_share is near zero — nations are
    statistically identical markets; skew in real data shifts it."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("l_suppkey", "s_nationkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
        .select(F.col("s_nationkey").alias("nk"), "cents")
    )
    rev = lazy_persist(rev)
    tot = rev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sx"),
    )
    share = F.col("cents").cast("double") * F.col("n") / F.col("sx")
    t_tot = (
        rev.filter(F.col("cents") > 0)
        .crossJoin(tot)
        .select((share * F.log(share)).cast("decimal(28,15)").alias("tm"))
        .agg(F.sum("tm").alias("tsum"))
    )
    grp = rev.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("cents").cast("bigint").alias("sg"),
    )
    grp = lazy_persist(grp)
    bterm = (F.col("sg").cast("double") / F.col("sx")) * F.log(
        (F.col("sg").cast("double") * F.col("n"))
        / (F.col("sx").cast("double") * F.col("ng"))
    )
    t_btw = (
        grp.filter(F.col("sg") > 0)
        .crossJoin(tot)
        .select(bterm.cast("decimal(28,15)").alias("bm"))
        .agg(F.sum("bm").alias("bsum"))
    )
    n_nations = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nations")
    )
    theil_total = F.col("tsum").cast("double") / F.col("n")
    theil_between = F.col("bsum").cast("double")
    return (
        tot.crossJoin(t_tot)
        .crossJoin(t_btw)
        .crossJoin(n_nations)
        .select(
            F.col("n").alias("n_suppliers"),
            "n_nations",
            F.round(theil_total, 6).alias("theil_total"),
            F.round(theil_between, 6).alias("theil_between"),
            F.round(theil_total - theil_between, 6).alias("theil_within"),
            F.when(
                F.col("tsum") != 0,
                F.round(theil_between / theil_total, 6),
            )
            .otherwise(F.lit(0.0))
            .alias("between_share"),
        )
    )


# ---------------------------------------------------------------------------
# Lorenz curve of customer revenue concentration — the curve BEHIND
# gini_supplier_revenue's single number: per revenue decile (ranked
# ascending), the share and cumulative share of total spend. Reads as
# "the bottom 50% of customers hold cum_revenue_share of revenue".
# ---------------------------------------------------------------------------
@query(
    "orders_lorenz_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT cents,
             (10 * ROW_NUMBER() OVER (ORDER BY cents, o_custkey)
              + COUNT(*) OVER () - 1) // COUNT(*) OVER () AS decile
      FROM rev
    ),
    d AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS dc
      FROM ranked GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(dc) AS BIGINT) AS t FROM d),
    c AS (
      SELECT decile, n_customers, dc,
             CAST(SUM(dc) OVER (ORDER BY decile) AS BIGINT) AS cum
      FROM d
    )
    SELECT CAST(c.decile AS BIGINT) AS decile, n_customers,
           ROUND(CAST(dc AS DOUBLE) / t, 6) AS revenue_share,
           ROUND(CAST(cum AS DOUBLE) / t, 6) AS cum_revenue_share
    FROM c, tot ORDER BY decile
    """,
)
def orders_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve points at decile resolution over per-customer
    lifetime spend (exact integer cents): customers ranked ascending
    by spend through the shared two-pass row-number harness, decile =
    ceil(10*rank/n) by pure integer arithmetic (the rfm quartile
    convention at k=10), then per-decile exact sums. The cumulative
    window runs over TEN rows — bounded, so its single-partition
    window is free at any scale; everything before it is
    range-partitioned. Shares are one rounded double division each."""
    o = load_tables(spark, sf_dir)["orders"]
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    ranked, n = global_row_number(rev, ["cents", "o_custkey"], out="rn")
    decile = ((10 * F.col("rn") + n - 1) / n).cast("bigint")
    d = (
        ranked.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("dc"),
        )
    )
    tot = d.agg(F.sum("dc").cast("bigint").alias("t"))
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.withColumn("cum", F.sum("dc").over(w).cast("bigint"))
    return (
        c.crossJoin(tot)
        .select(
            "decile",
            "n_customers",
            F.round(F.col("dc").cast("double") / F.col("t"), 6).alias(
                "revenue_share"
            ),
            F.round(F.col("cum").cast("double") / F.col("t"), 6).alias(
                "cum_revenue_share"
            ),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# ABC-XYZ inventory matrix — the two-axis classification every supply
# planner runs: ABC = revenue concentration (the pareto_abc_parts
# cut), XYZ = demand PREDICTABILITY via the coefficient of variation
# of weekly demand. The 3x3 matrix tells you what to forecast
# statistically (AX) vs what to buffer or make-to-order (CZ).
# ---------------------------------------------------------------------------
XYZ_X_MAX = 0.5  # cv below -> X (steady demand)
XYZ_Y_MAX = 0.6  # cv below -> Y; above -> Z (erratic)
_ABC_WEEK_ANCHOR = "1995-01-01"


@query(
    "part_abc_xyz_matrix",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS t FROM rev),
    cum AS (
      SELECT l_partkey, rev_cents,
             CAST(SUM(rev_cents) OVER (
               ORDER BY rev_cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS c
      FROM rev
    ),
    abc AS (
      SELECT l_partkey, rev_cents,
             CASE WHEN CAST(c AS DOUBLE) / t <= 0.8 THEN 'A'
                  WHEN CAST(c AS DOUBLE) / t <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM cum, tot
    ),
    weekly AS (
      SELECT l_partkey,
             date_diff('day', DATE '{_ABC_WEEK_ANCHOR}',
                       CAST(l_shipdate AS DATE)) // 7 AS wk,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    mom AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(q) AS BIGINT) AS sq,
             CAST(SUM(q * q) AS BIGINT) AS sqq
      FROM weekly GROUP BY 1
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN cv < {XYZ_X_MAX} THEN 'X'
                  WHEN cv < {XYZ_Y_MAX} THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM (
        SELECT l_partkey,
               ROUND(sqrt(GREATEST(CAST(sqq AS DOUBLE) / nw
                          - (CAST(sq AS DOUBLE) / nw)
                            * (CAST(sq AS DOUBLE) / nw), 0))
                     / (CAST(sq AS DOUBLE) / nw), 6) AS cv
        FROM mom
      )
    )
    SELECT abc_class, xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(rev_cents) AS DOUBLE) / (SELECT t FROM tot), 6)
             AS revenue_share
    FROM abc JOIN xyz USING (l_partkey)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 ABC-XYZ matrix over parts: ABC from cumulative revenue
    share (A <= 80%, B <= 95% — the pareto_abc_parts convention,
    exact integer cents through the shared two-pass prefix harness,
    never a single-partition window), XYZ from the ROUNDED coefficient
    of variation of weekly shipped quantity (exact integer moments;
    one sqrt/divide in double, GREATEST-guarded against float
    cancellation below zero). Each matrix cell reports its part count
    and revenue share.

    Plan: two grouped scans of lineitem (revenue, weekly demand), one
    harness pass for the cumulative rank, per-part moment fold, one
    part-keyed join, 9-row final aggregate."""
    li = load_tables(spark, sf_dir)["lineitem"]
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev_cents")
    ).withColumn("neg_cents", -F.col("rev_cents"))
    from disco_spark.operators.relational2 import global_prefix_sum

    cum, total = global_prefix_sum(
        rev, ["neg_cents", "l_partkey"], "rev_cents", out="cum_before"
    )
    share = (F.col("cum_before") + F.col("rev_cents")).cast(
        "double"
    ) / F.lit(float(total))
    abc = cum.select(
        "l_partkey",
        "rev_cents",
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    weekly = li.select(
        "l_partkey",
        F.floor(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit(_ABC_WEEK_ANCHOR).cast("date"),
            )
            / 7
        ).alias("wk"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qr"),
    ).groupBy("l_partkey", "wk").agg(
        F.sum("qr").cast("bigint").alias("q")
    )
    mom = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("nw"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sqq"),
    )
    mean = F.col("sq").cast("double") / F.col("nw")
    var = F.greatest(
        F.col("sqq").cast("double") / F.col("nw") - mean * mean,
        F.lit(0.0),
    )
    cv = F.round(F.sqrt(var) / mean, 6)
    xyz = mom.select(
        "l_partkey",
        F.when(cv < XYZ_X_MAX, "X")
        .when(cv < XYZ_Y_MAX, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.sum("rev_cents").cast("double") / F.lit(float(total)), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class", "xyz_class")
    )


# ---------------------------------------------------------------------------
# Laspeyres price index — the economics read on the catalog: price
# change per ship-year holding the BASE year's quantity basket fixed
# (what the same 1995 basket would cost each year). Distinct from
# orders_mom_growth (volume trend): this isolates PRICE movement with
# explicit basket weights.
# ---------------------------------------------------------------------------
PRICE_INDEX_BASE_YEAR = 1995


@query(
    "part_price_index_laspeyres",
    oracle=f"""
    WITH py AS (
      SELECT l_partkey, year(l_shipdate) AS yr,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
               AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    base AS (
      SELECT l_partkey, qty AS q0,
             CAST(rev_cents AS DOUBLE) / qty AS p0
      FROM py WHERE yr = {PRICE_INDEX_BASE_YEAR} AND qty > 0
    ),
    cur AS (
      SELECT l_partkey, yr, CAST(rev_cents AS DOUBLE) / qty AS pt
      FROM py WHERE qty > 0
    ),
    terms AS (
      SELECT cur.yr,
             CAST(ROUND(cur.pt * base.q0, 6) AS DECIMAL(28,6)) AS num_t,
             CAST(ROUND(base.p0 * base.q0, 6) AS DECIMAL(28,6)) AS den_t
      FROM cur JOIN base ON base.l_partkey = cur.l_partkey
    )
    SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(num_t) AS DOUBLE)
                 / CAST(SUM(den_t) AS DOUBLE), 6) AS laspeyres
    FROM terms GROUP BY yr ORDER BY yr
    """,
)
def part_price_index_laspeyres(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Laspeyres price index per ship-year, base {PRICE_INDEX_BASE_YEAR}:
    sum(p_t * q_0) / sum(p_0 * q_0) over parts traded in both the
    base year and year t, with p = exact-cents revenue / integer
    quantity (the unit-value price). Index 1.0 = no price movement on
    the base basket. Each basket term rounds at 6 dp then accumulates
    in DECIMAL — order-independent, engine-identical.

    Plan: one grouped (part, year) scan, the base-year slice joined
    back on part, one grouped fold per year. Output bounded by the
    calendar (7 years)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    py = li.groupBy(
        "l_partkey", F.year("l_shipdate").alias("yr")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
        F.sum(F.round(F.col("l_quantity")).cast("bigint"))
        .cast("bigint")
        .alias("qty"),
    )
    py = lazy_persist(py)
    price = F.col("rev_cents").cast("double") / F.col("qty")
    base = py.filter(
        (F.col("yr") == PRICE_INDEX_BASE_YEAR) & (F.col("qty") > 0)
    ).select(
        F.col("l_partkey").alias("_bp"),
        F.col("qty").alias("q0"),
        price.alias("p0"),
    )
    cur = py.filter(F.col("qty") > 0).select(
        "l_partkey", "yr", price.alias("pt")
    )
    terms = cur.join(base, F.col("_bp") == F.col("l_partkey")).select(
        "yr",
        F.round(F.col("pt") * F.col("q0"), 6)
        .cast("decimal(28,6)")
        .alias("num_t"),
        F.round(F.col("p0") * F.col("q0"), 6)
        .cast("decimal(28,6)")
        .alias("den_t"),
    )
    return (
        terms.groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.sum("num_t").cast("double")
                / F.sum("den_t").cast("double"),
                6,
            ).alias("laspeyres"),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Monetary-quartile migration matrix — the transition view Spearman's
# single rho (spearman_rank_stability) summarizes away: per customer,
# spend quartile in the early period vs the late period, as a 4x4
# flow matrix. The diagonal is loyalty; the corners are churn-to-top
# and collapse-to-bottom.
# ---------------------------------------------------------------------------
MIGRATION_SPLIT_YEAR = 1999


@query(
    "customer_quartile_migration",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey,
             CASE WHEN year(o_orderdate) < {MIGRATION_SPLIT_YEAR}
                  THEN 'p1' ELSE 'p2' END AS period,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    q AS (
      SELECT o_custkey, period,
             (4 * ROW_NUMBER() OVER (
                PARTITION BY period ORDER BY cents, o_custkey)
              + COUNT(*) OVER (PARTITION BY period) - 1)
             // COUNT(*) OVER (PARTITION BY period) AS quartile
      FROM spend
    )
    SELECT CAST(a.quartile AS BIGINT) AS q_early,
           CAST(b.quartile AS BIGINT) AS q_late,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM q a JOIN q b ON a.o_custkey = b.o_custkey
    WHERE a.period = 'p1' AND b.period = 'p2'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def customer_quartile_migration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """4x4 spend-quartile migration matrix between the pre- and
    post-{MIGRATION_SPLIT_YEAR} periods (quartile 1 = lowest spend,
    the rfm ceil(4r/n) integer convention), counting customers active
    in both. Exact integer cents and ranks; ranks run through the
    shared two-pass row-number harness per period — no
    single-partition window (the per-period ordered window in the
    ORACLE is DuckDB-only replay).

    Plan: one grouped scan, two harness passes (one per period
    partition, expressed as filters), a self-join on customer, a
    16-cell fold."""
    o = load_tables(spark, sf_dir)["orders"]
    spend = o.groupBy(
        "o_custkey",
        F.when(
            F.year("o_orderdate") < MIGRATION_SPLIT_YEAR, "p1"
        )
        .otherwise("p2")
        .alias("period"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    spend = lazy_persist(spend)

    def quartiles(period: str) -> DataFrame:
        part = spend.filter(F.col("period") == period)
        ranked, n = global_row_number(
            part, ["cents", "o_custkey"], out="rn"
        )
        return ranked.select(
            "o_custkey",
            ((4 * F.col("rn") + n - 1) / n).cast("bigint").alias("q"),
        )

    a = quartiles("p1").select(
        F.col("o_custkey").alias("_c1"), F.col("q").alias("q_early")
    )
    b = quartiles("p2").select(
        F.col("o_custkey").alias("_c2"), F.col("q").alias("q_late")
    )
    return (
        a.join(b, F.col("_c1") == F.col("_c2"))
        .groupBy("q_early", "q_late")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("q_early", "q_late")
    )


# ---------------------------------------------------------------------------
# Balassa revealed comparative advantage — the trade-economics read on
# the supplier network: does nation n ship disproportionately much of
# part-type s relative to the world mix? RCA > 1 = revealed
# specialization. The per-cell normalization nation_trade_matrix
# doesn't do.
# ---------------------------------------------------------------------------
@query(
    "nation_rca_by_part_type",
    oracle="""
    WITH x AS (
      SELECT n.n_name AS nation, p.p_type AS ptype,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    xn AS (SELECT nation, CAST(SUM(cents) AS BIGINT) AS tot_n
           FROM x GROUP BY 1),
    xs AS (SELECT ptype, CAST(SUM(cents) AS BIGINT) AS tot_s
           FROM x GROUP BY 1),
    xw AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot_w FROM x)
    SELECT x.nation, x.ptype,
           ROUND(CAST(x.cents AS DOUBLE) / 100, 2) AS revenue,
           ROUND((CAST(x.cents AS DOUBLE) / xn.tot_n)
                 / (CAST(xs.tot_s AS DOUBLE) / xw.tot_w), 6) AS rca,
           CASE WHEN (CAST(x.cents AS DOUBLE) / xn.tot_n)
                     / (CAST(xs.tot_s AS DOUBLE) / xw.tot_w) > 1
                THEN 1 ELSE 0 END AS specialized
    FROM x
    JOIN xn ON xn.nation = x.nation
    JOIN xs ON xs.ptype = x.ptype
    CROSS JOIN xw
    ORDER BY x.nation, x.ptype
    """,
)
def nation_rca_by_part_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balassa RCA per (supplier nation, part type): the nation's
    revenue share in that type divided by the world's share —
    (x_ns / X_n) / (x_ws / X_w), exact integer cents everywhere, two
    rounded double divisions per cell, specialization flagged on the
    UNROUNDED ratio identically in both engines. Output bounded by
    |nations| x |types| regardless of volume.

    Plan: one fact scan with two broadcast dim joins + a supplier
    hash join, then three grouped margins (cell, nation, type) and a
    1-row world total cross-joined back."""
    t = load_tables(spark, sf_dir)
    x = (
        t["lineitem"]
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_type")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"), F.col("p_type").alias("ptype")
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    x = lazy_persist(x)
    xn = x.groupBy("nation").agg(
        F.sum("cents").cast("bigint").alias("tot_n")
    )
    xs = x.groupBy("ptype").agg(
        F.sum("cents").cast("bigint").alias("tot_s")
    )
    xw = x.agg(F.sum("cents").cast("bigint").alias("tot_w"))
    rca_raw = (F.col("cents").cast("double") / F.col("tot_n")) / (
        F.col("tot_s").cast("double") / F.col("tot_w")
    )
    return (
        x.join(xn, "nation")
        .join(xs, "ptype")
        .crossJoin(F.broadcast(xw))
        .select(
            "nation",
            "ptype",
            F.round(F.col("cents").cast("double") / 100, 2).alias(
                "revenue"
            ),
            F.round(rca_raw, 6).alias("rca"),
            (rca_raw > 1).cast("int").alias("specialized"),
        )
        .orderBy("nation", "ptype")
    )
