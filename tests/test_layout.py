"""Storage-layout behaviors that matter at 100 TB: partitioned writes
with partition pruning at read, and format round-trips (parquet/orc/
json/csv) for the source/sink matrix (SURVEY §2.1 — the reference's
scheme_dir label index maps to partitioned layouts; its chunked DDFS
blobs map to parquet file sizing, covered in test_sources.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from disco_spark.session import load_tables
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_at_read(spark, tmp_path):
    """hive-style partitionBy(lang) layout: a lang='en' read must plan a
    PartitionFilters-pruned scan touching only that directory."""
    docs = load_tables(spark, SF_SMOKE)["documents"]
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").parquet(out)

    back = spark.read.parquet(out)
    en = back.filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:800]

    want = docs.filter(F.col("lang") == "en").count()
    assert en.count() == want
    # pruning is real: only the matching partition directory is listed
    import glob
    import os

    assert os.path.isdir(os.path.join(out, "lang=en"))
    n_dirs = len(glob.glob(os.path.join(out, "lang=*")))
    assert n_dirs > 1  # multiple langs exist; reader touches one


def test_format_round_trips(spark, tmp_path):
    """The same DataFrame written and re-read via every bundled columnar/
    text format must survive unchanged (column order normalized)."""
    df = (
        load_tables(spark, SF_SMOKE)["documents"]
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(100)
    )
    want = {(r.doc_id, r.lang, r.n_chars) for r in df.collect()}
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"rt_{fmt}")
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.format(fmt).save(path)
        r = spark.read
        if fmt == "csv":
            r = r.option("header", "true").option("inferSchema", "true")
        back = r.format(fmt).load(path).select("doc_id", "lang", "n_chars")
        got = {(r2.doc_id, r2.lang, r2.n_chars) for r2 in back.collect()}
        assert got == want, f"{fmt} round-trip mismatch"
