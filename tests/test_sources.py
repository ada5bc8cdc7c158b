"""Sources, catalog (DDFS tag analog), and external-program operator."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from disco_spark import registry
from disco_spark.operators.external import pipe_table, pipe_with_metrics
from disco_spark.sources.catalog import TagCatalog
from disco_spark.sources.readers import (
    chunked_write,
    read_lines,
    read_netstring,
    read_raw,
    result_iterator,
    re_reader_df,
    write_netstring,
)
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()


@pytest.mark.parametrize(
    "name", ["source_re_reader", "source_raw_literals", "external_pipe_upper"]
)
def test_source_oracle(spark, name):
    compare_query(spark, name, SF_SMOKE)


def test_read_lines_and_gzip(spark, tmp_path):
    import gzip

    p = tmp_path / "plain.txt"
    p.write_text("one\ntwo\nthree\n")
    gz = tmp_path / "zipped.txt.gz"
    with gzip.open(gz, "wt") as f:
        f.write("four\nfive\n")
    plain = {r.line for r in read_lines(spark, str(p)).collect()}
    zipped = {r.line for r in read_lines(spark, str(gz)).collect()}
    assert plain == {"one", "two", "three"}
    assert zipped == {"four", "five"}  # transparent gzip decode


def test_re_reader_multiple_matches(spark):
    df = spark.createDataFrame([("a1 b22 c333",)], "s string")
    out = [r.match for r in re_reader_df(df, "s", r"[0-9]+").collect()]
    assert sorted(out) == ["1", "22", "333"]


def test_raw_scheme(spark):
    vals = {r.value for r in read_raw(spark, ["raw://x", "plain"]).collect()}
    assert vals == {"x", "plain"}


def test_netstring_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("hello",), ("wor,ld",), ("",), ("tab\tchar",)], "value string")
    path = str(tmp_path / "ns")
    write_netstring(df, path)
    back = {r.value for r in read_netstring(spark, path).collect()}
    assert back == {"hello", "wor,ld", "", "tab\tchar"}


def test_chunked_write_bounds_file_count(spark, tmp_path):
    df = spark.range(100_000).select(F.col("id"), F.md5(F.col("id").cast("string")).alias("h"))
    path = str(tmp_path / "chunks")
    chunked_write(df.repartition(1), path, target_mb=1)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) >= 2  # 1MB target forces a split
    assert spark.read.parquet(path).count() == 100_000


def test_result_iterator_streams(spark):
    df = spark.range(10).select(F.col("id"))
    assert sorted(v for (v,) in result_iterator(df)) == list(range(10))


def test_tag_catalog_crud_and_walk(spark):
    cat = TagCatalog(spark)
    for t in ("t_a", "t_b", "t_parent", "t_grand"):
        cat.delete(t)
    cat.push("t_a", spark.createDataFrame([(1,)], "v bigint"))
    cat.push("t_b", spark.createDataFrame([(2,)], "v bigint"))
    cat.push("t_a", spark.createDataFrame([(3,)], "v bigint"))  # append = add blob
    try:
        assert sorted(r.v for r in cat.get("t_a").collect()) == [1, 3]
        cat.link("t_parent", ["t_a", "t_b"])
        assert sorted(r.v for r in cat.get("t_parent").collect()) == [1, 2, 3]
        cat.link("t_grand", ["t_parent"])
        assert cat.walk("t_grand") == ["t_grand", "t_parent", "t_a", "t_b"]
        cat.setattr("t_a", "owner", "pipeline-7")
        assert cat.getattr("t_a", "owner") == "pipeline-7"
        cat.delattr("t_a", "owner")
        assert cat.getattr("t_a", "owner") is None
        assert "t_a" in cat.findtags("t_")
    finally:
        for t in ("t_grand", "t_parent", "t_a", "t_b"):
            cat.delete(t)


def test_pipe_with_metrics_oob(spark):
    df = spark.createDataFrame([("x",), ("y",), ("z",)], "s string")
    out, acc = pipe_with_metrics(df, "tr 'a-z' 'A-Z'", "s string")
    got = {r.s for r in out.collect()}
    assert got == {"X", "Y", "Z"}
    assert acc.value == 3  # OOB counter observed on the driver


def test_pipe_awk_multiline(spark):
    """1->N from the external program (like reference external map)."""
    df = spark.createDataFrame([("a b",), ("c",)], "s string")
    out = pipe_table(df, "awk '{for(i=1;i<=NF;i++) print $i}'", "tok string")
    assert sorted(r.tok for r in out.collect()) == ["a", "b", "c"]


def test_sink_foreach_partition_delivers_all_rows(spark, tmp_path):
    """Connector-sink pattern: executor-side writer per partition; every
    row delivered exactly once (file-backed fake store)."""
    import glob
    import os
    import uuid

    from disco_spark.sources.readers import sink_foreach_partition

    out_dir = str(tmp_path / "fake_store")
    os.makedirs(out_dir, exist_ok=True)
    df = spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(6)

    def writer_factory():
        path = os.path.join(out_dir, f"{uuid.uuid4().hex}.txt")
        fh = open(path, "w")
        return (lambda row: fh.write(f"{row['id']},{row['v']}\n")), fh.close

    n = sink_foreach_partition(df, writer_factory)
    assert n == 1000
    rows = set()
    for f in glob.glob(os.path.join(out_dir, "*.txt")):
        for line in open(f):
            i, v = line.strip().split(",")
            rows.add((int(i), int(v)))
    assert rows == {(i, i * 2) for i in range(1000)}


def test_disco_netstring_reads_handwritten_bytes(spark, tmp_path):
    """Wire-format parity: bytes written exactly as the reference's
    DiscoPlainOut ('<klen> <key> <vlen> <value>\\n', task_io.py:325) —
    including a value with an embedded newline, which a line reader
    could not frame — parse back to the original records."""
    from disco_spark.sources.readers import read_disco_netstring

    records = [("k1", "hello"), ("key two", "multi\nline value"), ("3", "")]
    raw = b"".join(
        f"{len(k)} {k} {len(v)} {v}\n".encode() for k, v in records
    )
    d = tmp_path / "ns"
    d.mkdir()
    (d / "chunk-0").write_bytes(raw)
    out = sorted(map(tuple, read_disco_netstring(spark, str(d)).collect()))
    assert out == sorted(records)


def test_disco_netstring_roundtrip(spark, tmp_path):
    from disco_spark.sources.readers import read_disco_netstring, write_disco_netstring

    df = spark.range(500).selectExpr("CAST(id AS STRING) AS key", "repeat('x', CAST(id % 7 AS INT)) AS value")
    path = str(tmp_path / "rt")
    write_disco_netstring(df, path)
    back = read_disco_netstring(spark, path)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, back.collect()))


def test_read_redis_partitioned_snapshot(spark):
    """scheme_redis read parity over an injected fake client: one row
    per list element, executors fetch values (driver sees keys only)."""
    from disco_spark.sources.demo import FakeRedis
    from disco_spark.sources.readers import read_redis

    data = {f"k{i}": [f"v{i}a", f"v{i}b", f"v{i}c"] for i in range(40)}
    out = read_redis(spark, "redis://x:0:0", client_factory=lambda: FakeRedis(data))
    got = sorted(map(tuple, out.collect()))
    want = sorted((k, v) for k, vs in data.items() for v in vs)
    assert got == want


def test_native_lib_cbrt_oracle(spark):
    """ctypes shared-lib UDF parity (reference external.py:28-52 per-task
    native init): libm-backed pandas UDF matches DuckDB bit-exactly."""
    compare_query(spark, "native_lib_cbrt", SF_SMOKE)


def test_xml_records_oracle(spark):
    from disco_spark.testing import compare_query
    from tests.conftest import SF_SMOKE

    compare_query(spark, "source_xml_records", SF_SMOKE)


def test_xml_records_multiline_and_attrs(spark, tmp_path):
    """Element bodies spanning lines + attributes on the open tag, like
    a real wiki dump; records must survive the delimiter split."""
    from disco_spark.sources.readers import read_xml_records, xml_field
    from pyspark.sql import functions as F

    p = tmp_path / "dump.xml"
    p.write_text(
        "<feed>\n"
        '<page id="1" ns="0"><title>alpha</title><text>line one\nline two</text></page>\n'
        '<page id="2"><title>beta</title><text>solo</text></page>\n'
        "</feed>\n"
    )
    recs = read_xml_records(spark, str(p), "page")
    rows = {
        r.title: r.text
        for r in recs.select(
            xml_field(F.col("record"), "title").alias("title"),
            xml_field(F.col("record"), "text").alias("text"),
        ).collect()
    }
    assert rows == {"alpha": "line one\nline two", "beta": "solo"}


def test_catalog_tag_walk_oracle(spark):
    from disco_spark.testing import compare_query
    from tests.conftest import SF_SMOKE

    compare_query(spark, "catalog_tag_walk", SF_SMOKE)


def test_sink_roundtrip_oracle(spark):
    from disco_spark.testing import compare_query
    from tests.conftest import SF_SMOKE

    compare_query(spark, "sink_partitioned_roundtrip", SF_SMOKE)


def test_chunked_ingest_oracle(spark):
    from disco_spark.testing import compare_query
    from tests.conftest import SF_CORRECT

    # sf0.01, not the smoke dir: the size bound needs enough rows
    # (60k) to exceed rows-per-file and genuinely split the output
    compare_query(spark, "source_chunked_ingest", SF_CORRECT)
