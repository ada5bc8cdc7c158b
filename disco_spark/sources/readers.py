"""Source readers: the reference's URL-scheme/line-reader surface
(SURVEY §2.1) re-expressed on Spark datasources.

| reference                                   | here                        |
|---------------------------------------------|-----------------------------|
| scheme_file / scheme_http line readers      | read_lines (spark.read.text)|
| gzip_line_reader (task_io.py:11-27)         | read_lines — Spark decodes  |
|                                             | .gz transparently by codec  |
| re_reader (task_io.py:251-317)              | re_reader / re_reader_df    |
| netstring reader/writer (task_io.py:184-249)| read_netstring/write_netstring |
| scheme_raw (scheme_raw.py:1-10)             | read_raw                    |
| csv test fixtures (tests/test_query.py)     | read_csv_named              |
| DDFS chunk ingest (ddfs.py:121-159)         | chunked_write               |
| result_iterator (core.py:383-420)           | result_iterator             |

hdfs/s3 scheme parity is Spark-native (hdfs:// and s3a:// URIs on any
reader here); redis-style sinks are foreachPartition writers — both out
of local-test scope, documented for cluster use.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Text lines, one row per line; .gz/.bz2 paths decompress natively
    (the gzip_line_reader equivalent)."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def re_reader_df(df: DataFrame, col: str, pattern: str) -> DataFrame:
    """The reference re_reader: yield every regex match as a record
    (one row per match, 1->N)."""
    return df.select(
        F.explode(F.regexp_extract_all(F.col(col), F.lit(pattern), 0)).alias("match")
    )


def read_raw(spark: SparkSession, urls: list[str]) -> DataFrame:
    """raw:// inputs — the URL body IS the record (scheme_raw.py:1-10)."""
    rows = []
    for u in urls:
        body = u[len("raw://"):] if u.startswith("raw://") else u
        rows.append((body,))
    return spark.createDataFrame(rows, "value string")


def read_csv_named(spark: SparkSession, path: str, **options) -> DataFrame:
    """CSV with the reference test-fixture convention (first row may be a
    table name — handled by plain header options here)."""
    return spark.read.options(header=True, inferSchema=True, **options).csv(path)


# --------------------------------------------------------------------------
# netstring compat (reference task_io.py:184-249: '<len> <data>,' frames;
# we keep the classic netstring wire form 'len:data,')
# --------------------------------------------------------------------------
def write_netstring(df: DataFrame, path: str, col: str = "value") -> None:
    """Write one netstring frame per row into part files (binary sink,
    one file per partition — the plain_output_stream analog)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                f"{len(s.encode())}:".encode() + s.encode() + b","
                for s in pdf[col].astype(str)
            ]
            yield pd.DataFrame({"frame": [b"".join(frames)]})

    frames = df.mapInPandas(encode, schema="frame binary")
    # text/binary part files: reuse parquet for the frame blobs' container
    frames.write.mode("overwrite").parquet(path)


def read_netstring(spark: SparkSession, path: str) -> DataFrame:
    """Parse netstring frames back to rows (streaming parser per blob)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["frame"]:
                buf = bytes(blob)
                i = 0
                while i < len(buf):
                    j = buf.index(b":", i)
                    n = int(buf[i:j])
                    out.append(buf[j + 1 : j + 1 + n].decode())
                    i = j + 1 + n + 1  # skip trailing comma
            yield pd.DataFrame({"value": out})

    return spark.read.parquet(path).mapInPandas(decode, schema="value string")


# --------------------------------------------------------------------------
# legacy disco netstring byte-stream files (task_io.py:184-325):
# DiscoPlainOut writes '<klen> <key> <vlen> <value>\n' per record;
# old_netstr_reader parses two length-prefixed frames per record.
# These functions read/write the ACTUAL on-disk byte format (wire-format
# parity), unlike read_netstring/write_netstring above which carry
# classic 'len:data,' netstrings inside parquet binary columns.
# --------------------------------------------------------------------------
def write_disco_netstring(
    df: DataFrame, path: str, key_col: str = "key", val_col: str = "value"
) -> None:
    """Write (key, value) rows as legacy disco plain-output files.

    Pure JVM: one format_string per row, text sink appends the trailing
    newline — matching DiscoPlainOut byte for byte. One file per
    partition; scales as any text write does."""
    line = F.format_string(
        "%d %s %d %s",
        F.length(F.col(key_col).cast("string")),
        F.col(key_col).cast("string"),
        F.length(F.col(val_col).cast("string")),
        F.col(val_col).cast("string"),
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def iter_disco_frames(buf: bytes):
    """Yield (key, value) pairs from one legacy disco netstring byte
    stream ('<klen> <key> <vlen> <value>\\n' per record,
    task_io.py:184-249) — the ONE frame parser shared by the
    mapInPandas reader below and the Python DataSource
    (sources/pyds.py)."""
    i = 0

    def frame(i: int) -> tuple[str, int]:
        j = buf.index(b" ", i, i + 11)
        n = int(buf[i:j])
        return buf[j + 1 : j + 1 + n].decode(), j + 1 + n + 1

    while i < len(buf):
        k, i = frame(i)
        v, i = frame(i)
        yield k, v


def read_disco_netstring(spark: SparkSession, path: str) -> DataFrame:
    """Parse legacy disco netstring byte streams back to (key, value).

    Byte-accurate framing via the declared lengths (values MAY embed
    newlines, so this cannot be a line reader): binaryFile source gives
    one blob per file, an Arrow-batched parser walks the frames. Files
    are DDFS-chunk sized (64 MB) by convention, so per-file parse state
    is bounded; parallelism = number of chunk files, same as the
    reference's one-task-per-chunk model (task_io.py:184-249)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, vals = [], []
            for blob in pdf["content"]:
                for k, v in iter_disco_frames(bytes(blob)):
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame({"key": keys, "value": vals})

    blobs = spark.read.format("binaryFile").load(path).select("content")
    return blobs.mapInPandas(decode, schema="key string, value string")


# --------------------------------------------------------------------------
# redis scheme source (reference scheme_redis.py:1-41: SCAN the keyspace,
# LRANGE each key's list, yield one (key, value) record per element)
# --------------------------------------------------------------------------
def parse_redis_url(url: str) -> tuple[str, int, int]:
    """'redis://host:port:db' -> (host, port, db) — the reference's URL
    convention (scheme_redis.py:10-12)."""
    rest = url[len("redis://"):] if url.startswith("redis://") else url
    host, port, db = rest.split(":")
    return host, int(port), int(db)


def read_redis(
    spark: SparkSession,
    url: str,
    client_factory=None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Partitioned KV snapshot of a redis db: DataFrame[key, value], one
    row per list element per key (reference scheme_redis.py read()).

    Scale shape: the DRIVER scans only the key names (SCAN cursor —
    bounded memory, values never touch the driver), distributes keys
    across partitions, and each EXECUTOR partition opens one connection
    and LRANGEs its keys (the reference instead streamed the whole db
    through one client). ``client_factory()`` must return an object
    with ``scan_iter()`` and ``lrange(key, start, end)`` — by default a
    ``redis.StrictRedis`` for the url (import-gated: the library isn't
    in this container, so tests inject a deterministic fake with the
    same two methods).
    """
    if client_factory is None:
        host, port, db = parse_redis_url(url)

        def client_factory():
            import redis  # gated: not baked into the container

            return redis.StrictRedis(host=host, port=port, db=db)

    keys = [
        k.decode() if isinstance(k, bytes) else str(k)
        for k in client_factory().scan_iter()
    ]
    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    key_df = spark.createDataFrame([(k,) for k in keys], "key string").repartition(
        max(1, min(n_partitions, len(keys) or 1))
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()  # one connection per partition
        for pdf in batches:
            out_k, out_v = [], []
            for k in pdf["key"]:
                for v in client.lrange(k, 0, -1):
                    out_k.append(k)
                    out_v.append(v.decode() if isinstance(v, bytes) else str(v))
            yield pd.DataFrame({"key": out_k, "value": out_v})

    return key_df.mapInPandas(fetch, schema="key string, value string")


# --------------------------------------------------------------------------
# chunked ingest + client-side iteration
# --------------------------------------------------------------------------
def chunked_write(
    df: DataFrame, path: str, *, target_mb: int = 64, sample_rows: int = 1000
) -> None:
    """DDFS chunk analog (CHUNK_SIZE=64MB, fileutils.py:14): bound output
    file sizes via maxRecordsPerFile estimated from a row-size sample.
    On a cluster this is how ingest produces uniformly-sized parquet."""
    sample = df.limit(sample_rows).toPandas()
    row_bytes = max(1, int(sample.memory_usage(deep=True).sum() / max(len(sample), 1)))
    # parquet compresses ~3-5x vs in-memory pandas; stay conservative
    rows_per_file = max(1000, (target_mb * 1024 * 1024 * 3) // row_bytes)
    df.write.option("maxRecordsPerFile", rows_per_file).mode("overwrite").parquet(path)


def result_iterator(df: DataFrame):
    """Client-side streaming over results without materializing them on
    the driver (reference core.py:383-420). Rows stream partition by
    partition."""
    for row in df.toLocalIterator():
        yield tuple(row)


# --------------------------------------------------------------------------
# generic partition-parallel sink (the scheme_redis analog, SURVEY §2.1:
# reference scheme_redis.py:1-84 reads via key scan and WRITES via a
# per-record client — here the per-partition writer pattern every
# key-value / queue connector uses)
# --------------------------------------------------------------------------
def sink_foreach_partition(df: DataFrame, writer_factory) -> int:
    """Write each partition through a connection built ON THE EXECUTOR.

    ``writer_factory()`` runs once per partition (executor-side) and
    returns ``(write_fn, close_fn)`` — e.g. a redis pipeline, a JDBC
    batch, a Kafka producer. Rows stream through ``write_fn(row)``;
    ``close_fn()`` flushes. Returns the number of rows written (via a
    driver-side accumulator), so callers can assert delivery.

    Scale: one connection per partition (not per row, not per driver);
    no data ever moves to the driver.
    """
    acc = df.sparkSession.sparkContext.accumulator(0)

    def run(it):
        write, close = writer_factory()
        try:
            for row in it:
                write(row)
                acc.add(1)
        finally:
            close()

    df.foreachPartition(run)
    return acc.value


# --------------------------------------------------------------------------
# XML record extraction (reference examples/util/xml_reader.py: a SAX
# parser in a feeder thread yields the text of each <tag> element as one
# record). Spark-first analog: split the input files on the CLOSE tag
# with a custom record delimiter — Hadoop's text reader keeps custom-
# delimiter files splittable, so a 100 TB dump still fans out by HDFS
# block, with no SAX thread and no single-stream parse — then pull the
# element body with one regexp per record.
# --------------------------------------------------------------------------
def read_xml_records(spark: SparkSession, path: str, tag: str) -> DataFrame:
    """One row per <tag>...</tag> element: column `record` holds the
    element body (multi-line safe). Attributes on the open tag are
    allowed and discarded, like the reference's characters()-only
    handler."""
    raw = spark.read.text(path, lineSep=f"</{tag}>")
    body = F.regexp_extract(F.col("value"), f"(?s)<{tag}(?:\\s[^>]*)?>(.*)", 1)
    return raw.filter(F.col("value").contains(f"<{tag}")).select(body.alias("record"))


def xml_field(record, field: str):
    """Extract one child element's text from an XML record body."""
    return F.regexp_extract(record, f"(?s)<{field}>(.*?)</{field}>", 1)


def write_xml_records(df: DataFrame, path: str, tag: str) -> None:
    """Write each row as a <tag> element (columns become child
    elements) — the demo/export counterpart of read_xml_records. Values
    must be XML-safe (no escaping layer; this mirrors a dump format,
    not a general serializer)."""
    parts = [F.lit(f"<{tag}>")]
    for c in df.columns:
        parts += [F.lit(f"<{c}>"), F.col(c).cast("string"), F.lit(f"</{c}>")]
    parts += [F.lit(f"</{tag}>")]
    df.select(F.concat(*parts).alias("value")).write.mode("overwrite").text(path)
