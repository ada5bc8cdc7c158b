"""Z-order clustered write: key arithmetic pinned by the DuckDB oracle;
the layout effect (files tile the 2-d space, box predicates prune)
asserted on real written parquet files."""

from __future__ import annotations

import glob
import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from disco_spark import registry
from disco_spark.operators.zorder import zorder_write
from disco_spark.session import load_tables
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()

SF_001 = "/root/testdata/sf0.01"


def test_zorder_key_oracle(spark):
    compare_query(spark, "zorder_orders_key", SF_SMOKE)


def _files_overlapping_box(path, a_lo, a_hi, b_lo, b_hi):
    """How many written files a (custkey, orderdate) box predicate has
    to read, judged exactly the way a parquet reader does: by per-file
    min/max column stats."""
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert files, f"no parquet files under {path}"
    hit = 0
    for f in files:
        pdf = pd.read_parquet(f, columns=["o_custkey", "o_orderdate"])
        if pdf.empty:
            continue
        if (
            pdf.o_custkey.min() <= a_hi
            and pdf.o_custkey.max() >= a_lo
            and pdf.o_orderdate.min() <= b_hi
            and pdf.o_orderdate.max() >= b_lo
        ):
            hit += 1
    return hit, len(files)


def test_zorder_layout_prunes_2d_box(spark):
    """A 10% x 10% (custkey, date) box must overlap far fewer z-ordered
    files than round-robin-written files (where every file spans the
    whole space), and the clustered copy must return exactly the same
    rows."""
    t = load_tables(spark, SF_001)
    orders = t["orders"].withColumn(
        "__days", F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
    )
    # 64 files = an ~8x8 tile grid over the 2-d space; at 16 files each
    # file is a 25% x 25% rectangle and a 10% box can't prune much —
    # granularity, not the curve, sets the floor
    n_files = 64
    tmp = tempfile.mkdtemp(prefix="disco_spark_zorder_")
    z_path, rr_path = os.path.join(tmp, "z"), os.path.join(tmp, "rr")
    zorder_write(orders, ("o_custkey", "__days"), z_path, n_files)
    orders.repartition(n_files).write.mode("overwrite").parquet(rr_path)

    lo_a, hi_a = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    dates = orders.agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    # middle-10% box on both dimensions
    a_lo = lo_a + int(0.45 * (hi_a - lo_a))
    a_hi = lo_a + int(0.55 * (hi_a - lo_a))
    span_days = (dates[1] - dates[0]).days
    b_lo = pd.Timestamp(dates[0]) + pd.Timedelta(days=int(0.45 * span_days))
    b_hi = pd.Timestamp(dates[0]) + pd.Timedelta(days=int(0.55 * span_days))

    z_hit, z_total = _files_overlapping_box(z_path, a_lo, a_hi, b_lo, b_hi)
    rr_hit, rr_total = _files_overlapping_box(rr_path, a_lo, a_hi, b_lo, b_hi)
    assert z_total == n_files and rr_total == n_files
    assert rr_hit == n_files  # arrival order: every file spans the space
    assert z_hit <= rr_hit // 4, f"z-order read {z_hit}/{z_total} files"

    # clustering must not change the data: the boxed read-back matches
    pred = (
        (F.col("o_custkey") >= a_lo)
        & (F.col("o_custkey") <= a_hi)
        & (F.col("o_orderdate") >= F.lit(b_lo.date()))
        & (F.col("o_orderdate") <= F.lit(b_hi.date()))
    )
    want = {r[0] for r in orders.filter(pred).select("o_orderkey").collect()}
    got = {
        r[0]
        for r in spark.read.parquet(z_path).filter(pred).select("o_orderkey").collect()
    }
    assert got == want and want


def test_zorder_write_empty_input(spark):
    """An empty input must produce an empty (readable) table, not a
    TypeError from None min/max anchors."""
    import tempfile

    t = load_tables(spark, SF_001)
    empty = t["orders"].filter(F.lit(False)).withColumn(
        "__days", F.datediff("o_orderdate", F.lit("1992-01-01").cast("date"))
    )
    path = tempfile.mkdtemp(prefix="disco_spark_zorder_empty_")
    zorder_write(empty, ("o_custkey", "__days"), path, 4)
    assert spark.read.parquet(path).count() == 0


def test_zorder_3d_prunes_box(spark):
    """The N-dim generalization: lineitem clustered on (orderkey-range,
    partkey, suppkey) must let a 3-d box predicate skip most files by
    min/max stats, where round-robin reads all of them."""
    import tempfile

    from disco_spark.operators.zorder import zorder_write

    li = load_tables(spark, SF_001)["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    tmp = tempfile.mkdtemp(prefix="disco_spark_z3_")
    z_path, rr_path = os.path.join(tmp, "z"), os.path.join(tmp, "rr")
    n_files = 64
    zorder_write(li, ("l_orderkey", "l_partkey", "l_suppkey"), z_path, n_files)
    li.repartition(n_files).write.mode("overwrite").parquet(rr_path)

    los = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    box = {}
    for i, c in enumerate(("l_orderkey", "l_partkey", "l_suppkey")):
        lo, hi = los[2 * i], los[2 * i + 1]
        # middle 25% per dim -> ~1.6% of the 3-d volume
        box[c] = (lo + int(0.375 * (hi - lo)), lo + int(0.625 * (hi - lo)))

    def overlapping(path):
        files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
        hit = 0
        for f in files:
            pdf = pd.read_parquet(f, columns=list(box))
            if pdf.empty:
                continue
            if all(pdf[c].min() <= hi and pdf[c].max() >= lo
                   for c, (lo, hi) in box.items()):
                hit += 1
        return hit, len(files)

    z_hit, z_total = overlapping(z_path)
    rr_hit, rr_total = overlapping(rr_path)
    assert z_total == n_files and rr_hit == rr_total == n_files
    assert z_hit <= n_files // 2, f"3-d z-order read {z_hit}/{z_total} files"
