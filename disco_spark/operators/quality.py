"""Data-quality constraint audit — the declarative contract check a
pipeline runs on every ingest batch before data is allowed downstream
(the dbt-test / Deequ shape): null checks, value ranges, key
uniqueness, referential integrity, and cross-table temporal sanity,
each reported as (rule, n_violations).

Reference analog: none directly; the closest reference behavior is
DDFS's integrity checking of stored blobs (SURVEY §1.3) — this is the
same trust-but-verify contract lifted to row-level table semantics.

Scale story: rules are grouped by the SCAN that can serve them —
single-table rules compile to conditional aggregates (one pass per
table, map-side partials, no shuffle of raw rows), uniqueness is one
groupBy on the key, and each FK/temporal rule family shares ONE join
(the lineitem->orders join serves both the orphan check and the
ship-before-order check). Every rule's result is a 1-row aggregate;
the union of rules is constant-size regardless of data volume. At
100 TB the audit costs ~one read of each audited table — the minimum
any row-level audit can cost — and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.registry import query
from disco_spark.session import load_tables


def constraint_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_violations) for predicate rules sharing one scan of
    `df`; each Column is TRUE where the row VIOLATES the rule."""
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("bigint").alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(*aggs)
    pairs = [
        F.struct(F.lit(name).alias("rule"), F.col(name).alias("n_violations"))
        for name in rules
    ]
    return wide.select(F.explode(F.array(*pairs)).alias("r")).select(
        "r.rule", "r.n_violations"
    )


def fk_violations(
    child: DataFrame, parent: DataFrame, ckey: str, pkey: str, rule: str
) -> DataFrame:
    """(rule, n_violations): child rows whose key has no parent."""
    return (
        child.join(parent, child[ckey] == parent[pkey], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        .select(F.lit(rule).alias("rule"), "n_violations")
    )


def duplicate_key_count(df: DataFrame, key: str, rule: str) -> DataFrame:
    """(rule, n_violations): rows beyond the first per key value (0 on
    a unique column)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
            .cast("bigint")
            .alias("n_violations")
        )
        .select(F.lit(rule).alias("rule"), "n_violations")
    )


@query(
    "quality_constraint_violations",
    oracle="""
    SELECT 'lineitem_quantity_range' AS rule,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_over_5pct',
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_null_custkey',
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_date_out_of_range',
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01'
                         OR o_orderdate >= TIMESTAMP '2002-01-01'
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_price',
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'customer_duplicate_custkey',
           CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey)
    UNION ALL
    SELECT 'orders_fk_customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem_fk_orders', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'lineitem_ship_before_order', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate < o.o_orderdate
    """,
)
def quality_constraint_violations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ten-rule audit over lineitem/orders/customer: range, null,
    policy (discount cap — the one rule that fires on clean data, so
    the oracle verifies a real count), uniqueness, two FK checks, and
    one temporal cross-table rule. Rule families share scans/joins as
    described in the module docstring."""
    t = load_tables(spark, sf_dir)
    li, o, c = t["lineitem"], t["orders"], t["customer"]

    li_rules = constraint_counts(
        li,
        {
            "lineitem_quantity_range": (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50),
            "lineitem_nonpositive_price": F.col("l_extendedprice") <= 0,
            "lineitem_discount_over_5pct": F.col("l_discount") > 0.05,
        },
    )
    o_rules = constraint_counts(
        o,
        {
            "orders_null_custkey": F.col("o_custkey").isNull(),
            "orders_date_out_of_range": (
                F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp")
            )
            | (F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp")),
            "orders_nonpositive_price": F.col("o_totalprice") <= 0,
        },
    )
    uniq = duplicate_key_count(c, "c_custkey", "customer_duplicate_custkey")
    fk_oc = fk_violations(
        o.select("o_custkey"),
        c.select("c_custkey"),
        "o_custkey",
        "c_custkey",
        "orders_fk_customer",
    )
    # one lineitem->orders join serves both the orphan and the temporal
    # rule: left join, then conditional aggregates over the match result
    lo = li.select("l_orderkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left",
    )
    lo_rules = constraint_counts(
        lo,
        {
            "lineitem_fk_orders": F.col("o_orderkey").isNull(),
            "lineitem_ship_before_order": F.col("l_shipdate")
            < F.col("o_orderdate"),
        },
    )
    return (
        li_rules.unionByName(o_rules)
        .unionByName(uniq)
        .unionByName(fk_oc)
        .unionByName(lo_rules)
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit: the forensic screen for fabricated or
# re-keyed monetary columns. First digits come from exact integer
# cents rendered as strings (integer-to-string is engine-identical —
# no float log10 anywhere near a power-of-ten boundary).
# ---------------------------------------------------------------------------


@query(
    "benford_acctbal_audit",
    oracle="""
    WITH cents AS (
      SELECT 'customer' AS src,
             CAST(ROUND(abs(c_acctbal) * 100) AS BIGINT) AS c
      FROM customer
      UNION ALL
      SELECT 'supplier', CAST(ROUND(abs(s_acctbal) * 100) AS BIGINT)
      FROM supplier
    ),
    digit AS (
      SELECT src, CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS d
      FROM cents WHERE c > 0
    ),
    obs AS (SELECT src, d, COUNT(*) AS n FROM digit GROUP BY 1, 2),
    tot AS (SELECT src, SUM(n) AS t FROM obs GROUP BY 1)
    SELECT obs.src, obs.d, obs.n,
           ROUND(CAST(obs.n AS DOUBLE) / tot.t, 6) AS share,
           ROUND(log10(1.0 + 1.0 / obs.d), 6) AS benford,
           ROUND(CAST(obs.n AS DOUBLE) / tot.t
                 - log10(1.0 + 1.0 / obs.d), 6) AS excess
    FROM obs JOIN tot USING (src)
    """,
)
def benford_acctbal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of account balances (customer +
    supplier): observed leading-digit shares vs log10(1+1/d) with the
    excess per digit — the classic forensic-accounting screen for
    synthetic or tampered monetary columns (uniform generators, like
    this synthetic data's, light up immediately).

    The leading digit is taken from exact integer cents cast to a
    string — decimal-shift-invariant and engine-identical; no float
    log10 of the value itself, so power-of-ten boundaries can't
    misround. One union scan, a 2x9-cell grouped count, broadcast
    totals."""
    t = load_tables(spark, sf_dir)
    cents = (
        t["customer"]
        .select(
            F.lit("customer").alias("src"),
            F.round(F.abs(F.col("c_acctbal")) * 100)
            .cast("bigint")
            .alias("c"),
        )
        .unionByName(
            t["supplier"].select(
                F.lit("supplier").alias("src"),
                F.round(F.abs(F.col("s_acctbal")) * 100)
                .cast("bigint")
                .alias("c"),
            )
        )
    )
    obs = (
        cents.filter(F.col("c") > 0)
        .select(
            "src",
            F.substring(F.col("c").cast("string"), 1, 1)
            .cast("int")
            .alias("d"),
        )
        .groupBy("src", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.broadcast(obs.groupBy("src").agg(F.sum("n").alias("t")))
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return obs.join(tot, "src").select(
        "src",
        "d",
        "n",
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
        F.round(benford, 6).alias("benford"),
        F.round(
            F.col("n").cast("double") / F.col("t") - benford, 6
        ).alias("excess"),
    )


# ---------------------------------------------------------------------------
# Functional-dependency audit: does column X determine column Y?
# The profiling question behind key discovery, denormalization checks
# and "can I join on this" — here as a declared candidate list mixing
# key FDs (must hold) with attribute FDs (expected to fail on this
# uniform synthetic data), each reported with its violation counts.
# ---------------------------------------------------------------------------
FD_CANDIDATES = [
    # (table, determinant, dependent)
    ("part", "p_partkey", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
]


def _fd_oracle_one(table: str, det: str, dep: str) -> str:
    return f"""
      SELECT '{table}: {det} -> {dep}' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN cd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             CAST(MAX(cd) AS BIGINT) AS max_distinct_dep,
             CASE WHEN MAX(cd) = 1 THEN 1 ELSE 0 END AS holds
      FROM (
        SELECT {det}, COUNT(DISTINCT {dep}) AS cd
        FROM {table} GROUP BY 1
      )"""


@query(
    "fd_violations_audit",
    oracle=" UNION ALL ".join(
        _fd_oracle_one(*c) for c in FD_CANDIDATES
    )
    + " ORDER BY fd",
)
def fd_violations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit a declared list of candidate functional dependencies
    X -> Y: for each, the number of determinant groups, how many
    groups see more than one distinct dependent value (violations),
    the worst group's distinct-dependent count, and a holds flag.
    Key FDs (p_partkey -> p_brand, o_orderkey -> o_custkey) must
    hold; the attribute FDs document that brand does NOT determine
    type nor customer determine priority here.

    Plan: one groupBy(determinant) + exact COUNT(DISTINCT dependent)
    per candidate, folded to a 1-row summary each, unioned — cost is
    one scan + one shuffle per audited FD, output constant-size. At
    100 TB swap the exact distinct for approx_count_distinct > 1
    screening (the profile_orders_columns_approx pattern) if the
    determinant cardinality itself is huge; for key-discovery use
    the exact form stays definitive."""
    t = load_tables(spark, sf_dir)
    parts = []
    for table, det, dep in FD_CANDIDATES:
        g = (
            t[table]
            .groupBy(det)
            .agg(F.count_distinct(F.col(dep)).alias("cd"))
        )
        parts.append(
            g.agg(
                F.lit(f"{table}: {det} -> {dep}").alias("fd"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum((F.col("cd") > 1).cast("int"))
                .cast("bigint")
                .alias("n_violating"),
                F.max("cd").cast("bigint").alias("max_distinct_dep"),
                (F.max("cd") == 1).cast("int").alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("fd")
