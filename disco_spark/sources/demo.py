"""Registered queries for the source-reader and external-program
surfaces (everything here has a DuckDB oracle)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from disco_spark.operators.external import pipe_table
from disco_spark.registry import query
from disco_spark.session import load_tables
from disco_spark.sources.readers import (
    read_disco_netstring,
    read_raw,
    read_redis,
    write_disco_netstring,
)


class FakeRedis:
    """Deterministic in-memory stand-in for redis.StrictRedis exposing
    the two methods read_redis needs (scan_iter, lrange). The redis
    library isn't in this container; the Spark-side plumbing (driver key
    scan, per-partition connections, list expansion) is real and
    oracle-checked — swap the factory for redis.StrictRedis in prod."""

    def __init__(self, data: dict[str, list[str]]):
        self._data = data

    def scan_iter(self):
        return iter(self._data)

    def lrange(self, key: str, start: int, end: int):
        vals = self._data[key]
        return vals if end == -1 else vals[start : end + 1]


@query(
    "source_re_reader",
    oracle="""
    SELECT m AS match, COUNT(*) AS n
    FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS m FROM documents)
    GROUP BY m
    """,
)
def source_re_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """re_reader parity (reference task_io.py:251-317): every regex match
    is a record; counted per match here to keep output bounded."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(F.explode(F.regexp_extract_all(F.col("text"), F.lit("[a-z]+a[a-z]*"), 0)).alias("match"))
        .groupBy("match")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "source_raw_literals",
    oracle="""
    SELECT * FROM (VALUES ('alpha'), ('beta'), ('gamma')) AS t(value)
    """,
)
def source_raw_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw:// parity: the URL body is the record (scheme_raw.py:1-10)."""
    return read_raw(spark, ["raw://alpha", "raw://beta", "raw://gamma"])


# The FakeRedis fixture is necessarily driver-resident (it stands in for
# an external server), so the snapshot that seeds it must be BOUNDED: a
# deterministic doc_id slice, never the whole table. A real deployment
# passes client_factory=redis.StrictRedis and nothing is collected.
REDIS_FIXTURE_MAX_DOC_ID = 200


@query(
    "source_redis",
    oracle=f"""
    SELECT concat('doc:', CAST(doc_id AS VARCHAR)) AS key, lang AS value FROM documents
    WHERE doc_id < {REDIS_FIXTURE_MAX_DOC_ID}
    UNION ALL
    SELECT concat('doc:', CAST(doc_id AS VARCHAR)), source FROM documents
    WHERE doc_id < {REDIS_FIXTURE_MAX_DOC_ID}
    """,
)
def source_redis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """redis scheme source parity (scheme_redis.py:1-41): snapshot a KV
    db whose lists hold [lang, source] per document key, one output row
    per list element. Driver scans keys only; executors LRANGE their
    partition's keys through one connection each (see read_redis). The
    fixture seed is a bounded deterministic slice (see note above)."""
    t = load_tables(spark, sf_dir)
    rows = (
        t["documents"]
        .filter(F.col("doc_id") < REDIS_FIXTURE_MAX_DOC_ID)
        .select("doc_id", "lang", "source")
        .collect()
    )
    snapshot = {f"doc:{r['doc_id']}": [r["lang"], r["source"]] for r in rows}
    return read_redis(spark, "redis://fake:0:0", client_factory=lambda: FakeRedis(snapshot))


@query(
    "source_netstring",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS key, lang AS value FROM documents",
)
def source_netstring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy disco netstring wire format round-trip: write documents'
    (doc_id, lang) as '<klen> <key> <vlen> <value>\\n' byte-stream files
    (DiscoPlainOut, task_io.py:319-325), read them back with the
    byte-accurate frame parser (old_netstr_reader, task_io.py:184-249)."""
    t = load_tables(spark, sf_dir)
    # per-invocation dir: a fixed well-known temp path races across
    # concurrent sessions (the md5-fixture lesson, applied everywhere)
    path = tempfile.mkdtemp(prefix="disco_spark_netstring_")
    write_disco_netstring(
        t["documents"].select(
            F.col("doc_id").cast("string").alias("key"), F.col("lang").alias("value")
        ),
        path,
    )
    return read_disco_netstring(spark, path)


# Self-contained external program speaking the binary wire protocol
# (reference external.py:361-476): params netstring, then
# <u32 klen><key><u32 vlen><val> frames in, <u32 num> + pairs out.
# Python here only because it's guaranteed present — the protocol is
# language-agnostic (tests/fixtures/ext_echo.c is the C counterpart).
_MD5_FIXTURE = r"""
import hashlib, struct, sys

rd, wr = sys.stdin.buffer, sys.stdout.buffer

def read_exact(n):
    buf = b""
    while len(buf) < n:
        chunk = rd.read(n - len(buf))
        if not chunk:
            raise EOFError("truncated frame")
        buf += chunk
    return buf

# params netstring: b"<len>\n<body>", body items "<klen> <k> <vlen> <v>\n"
# (parse is length-driven, so values with spaces/newlines are safe)
lenline = b""
while (c := rd.read(1)) not in (b"", b"\n"):
    lenline += c
body = read_exact(int(lenline)) if int(lenline) else b""
params, i = {}, 0
while i < len(body):
    out = []
    for _ in range(2):
        j = body.index(b" ", i)
        ln = int(body[i:j])
        out.append(body[j + 1 : j + 1 + ln])
        i = j + 2 + ln
    params[out[0]] = out[1]
salt = params.get(b"salt", b"")

while (head := rd.read(4)):
    klen = struct.unpack("I", head)[0]
    k = read_exact(klen)
    vlen = struct.unpack("I", read_exact(4))[0]
    v = read_exact(vlen)
    digest = hashlib.md5(salt + v).hexdigest().encode()
    wr.write(struct.pack("I", 1))
    wr.write(struct.pack("I", len(k)) + k + struct.pack("I", len(digest)) + digest)
    wr.flush()
sys.stderr.write("**<MSG> fixture done\n")
"""


@query(
    "external_binary_md5",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS doc_id, md5('x' || text) AS text_md5 FROM documents",
)
def external_binary_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary external-program framing end-to-end (the reference's real
    wire protocol, not the TSV demo): documents stream through a
    salted-md5 program as length-prefixed byte frames — text with
    embedded newlines/tabs survives byte-exact — and the Params dict
    rides ahead of the records as a netstring. On a cluster the program
    ships to workers via spark-submit --files (the analog of the
    reference's disco.util.external() file packaging)."""
    import sys as _sys

    from disco_spark.operators.external import pipe_binary

    t = load_tables(spark, sf_dir)
    # mkstemp per invocation: a fixed well-known temp path races across
    # concurrent sessions and is symlink-attackable on shared hosts.
    fd, script = tempfile.mkstemp(prefix="disco_spark_md5_", suffix=".py")
    with os.fdopen(fd, "w") as fh:
        fh.write(_MD5_FIXTURE)
    out = pipe_binary(
        t["documents"].select(F.col("doc_id").cast("string"), "text"),
        [_sys.executable, script],
        params={"salt": "x"},
    )
    return out.select(
        F.col("key").cast("string").alias("doc_id"),
        F.col("value").cast("string").alias("text_md5"),
    )


@query(
    "external_pipe_upper",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS doc_id, upper(text) AS text_upper FROM documents",
)
def external_pipe_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-program operator end-to-end: documents piped through
    `tr a-z A-Z` as an executor-side subprocess (external.py parity)."""
    t = load_tables(spark, sf_dir)
    return pipe_table(
        t["documents"].select("doc_id", "text"),
        "tr 'a-z' 'A-Z'",
        "doc_id string, text_upper string",
    )


@query(
    "source_xml_records",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang FROM documents",
)
def source_xml_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML element-stream round-trip (reference examples/util/
    xml_reader.py): write documents' (doc_id, lang) as a <row> element
    dump, read it back by splitting on the close tag (splittable at
    scale — no SAX stream), extract fields with per-record regexps."""
    from disco_spark.sources.readers import (
        read_xml_records,
        write_xml_records,
        xml_field,
    )

    t = load_tables(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="disco_spark_xml_")
    write_xml_records(
        t["documents"].select(F.col("doc_id").cast("string"), "lang"), path, "row"
    )
    recs = read_xml_records(spark, path, "row")
    return recs.select(
        xml_field(F.col("record"), "doc_id").alias("doc_id"),
        xml_field(F.col("record"), "lang").alias("lang"),
    )


@query(
    "catalog_tag_walk",
    oracle="""
    SELECT 'ddfs_demo_lang_' || lang AS tag, COUNT(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def catalog_tag_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDFS catalog surface end-to-end (tag CRUD + link + walk,
    reference lib/disco/ddfs.py:94-364): push one tag per language,
    link an umbrella tag over them, walk the umbrella's DAG to its
    leaves, and count each leaf tag's members by reading it back
    through the catalog. Tags are overwrite-mode so the query is
    idempotent across driver runs."""
    from disco_spark.sources.catalog import TagCatalog

    t = load_tables(spark, sf_dir)
    cat = TagCatalog(spark)
    langs = sorted(
        r["lang"] for r in t["documents"].select("lang").distinct().collect()
    )
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    children = []
    for lang in langs:
        tag = f"ddfs_demo_lang_{lang}"
        # a previous SESSION may have left the managed-table location on
        # disk without a catalog entry (saveAsTable then refuses even in
        # overwrite mode: LOCATION_ALREADY_EXISTS) — drop both sides
        cat.delete(tag)
        shutil.rmtree(os.path.join(warehouse, tag), ignore_errors=True)
        cat.push(tag, t["documents"].filter(F.col("lang") == lang), mode="overwrite")
        children.append(tag)
    cat.link("ddfs_demo_all", children)
    leaves = [x for x in cat.walk("ddfs_demo_all") if x != "ddfs_demo_all"]
    parts = [
        cat.get(leaf).agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(leaf).alias("tag"), "n_docs"
        )
        for leaf in sorted(leaves)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "sink_partitioned_roundtrip",
    oracle="SELECT doc_id, lang FROM documents",
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connector-sink machinery end-to-end: stream every partition
    through an executor-side connection (sink_foreach_partition — the
    redis/JDBC/Kafka shape: one connection per partition, rows never
    visit the driver), then read the sink's files back and prove
    nothing was lost. The delivery accumulator is asserted against the
    source count before returning."""
    from disco_spark.sources.readers import sink_foreach_partition

    t = load_tables(spark, sf_dir)
    src = t["documents"].select("doc_id", "lang")
    path = tempfile.mkdtemp(prefix="disco_spark_sink_")

    def writer_factory():
        import os as _os
        import uuid as _uuid

        fh = open(_os.path.join(path, f"part-{_uuid.uuid4().hex}.tsv"), "w")
        return (
            lambda row: fh.write(f"{row['doc_id']}\t{row['lang']}\n"),
            fh.close,
        )

    n = sink_foreach_partition(src, writer_factory)
    expected = src.count()
    assert n == expected, f"sink dropped rows: wrote {n}, expected {expected}"
    return spark.read.csv(path, sep="\t", schema="doc_id bigint, lang string")


@query(
    "source_chunked_ingest",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    """,
)
def source_chunked_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDFS chunked-ingest analog end-to-end (CHUNK_SIZE-bounded output
    files, reference fileutils.py:14): chunk lineitem into size-bounded
    parquet files and read it back lossless. The assertion is on the
    BOUND itself: lineitem arrives as ONE input partition at sf0.01, so
    every extra output file exists only because maxRecordsPerFile
    (derived from target_mb and the sampled row size) split it — there
    is no repartition to split for free."""
    import glob

    from disco_spark.sources.readers import chunked_write

    t = load_tables(spark, sf_dir)
    src = t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"
    )
    path = tempfile.mkdtemp(prefix="disco_spark_chunk_")
    chunked_write(src.coalesce(1), path, target_mb=1)
    files = glob.glob(os.path.join(path, "part-*.parquet"))
    assert len(files) >= 2, (
        f"size bound produced {len(files)} file(s) — maxRecordsPerFile "
        "did not split a single-partition write"
    )
    return spark.read.parquet(path)


@query(
    "source_jsonl_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, md5(text) AS text_md5 FROM documents
    """,
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Lines roundtrip — the interchange format real training
    corpora ship in (one JSON object per line, gzip-splittable at the
    file level): write documents as JSONL, read back with an EXPLICIT
    schema (schema inference on 100 TB is a full extra pass — never
    infer in production), and prove text survives JSON escaping exactly
    (newlines, quotes, unicode) by hashing it against the source table.
    Spark-native format; the engine adds only the contract. The JSONL
    files live in a stable scratch dir (overwritten per call), not a
    deleted tempdir, so the returned plan stays lazily recomputable
    whenever the caller runs its action."""
    from disco_spark.session import scratch_dir

    t = load_tables(spark, sf_dir)
    src = t["documents"].select("doc_id", "lang", "source", "text")
    path = scratch_dir("jsonl_docs", sf_dir)
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "doc_id bigint, lang string, source string, text string"
    ).json(path)
    return back.select(
        "doc_id", "lang", "source", F.md5(F.col("text")).alias("text_md5")
    )


@query(
    "source_schema_evolution",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 2 = 1 THEN n_chars END AS quality_tier
    FROM documents
    """,
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on an append-only dataset — the 100 TB ingest
    reality: batch 1 was written before the pipeline computed
    `quality_tier`; batch 2 carries it. mergeSchema reconciles the
    footers (old rows surface NULL for the new column) WITHOUT
    rewriting batch 1 — rewriting history on every schema change is
    exactly what a petabyte store cannot do. Production note in plan
    terms: mergeSchema reads every footer at planning time, so pin the
    merged schema explicitly once it stabilizes (read.schema(...)), as
    every other reader in this repo does."""
    from disco_spark.session import scratch_dir

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    path = scratch_dir("schema_evo", sf_dir)
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "batch=0"))
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.col("n_chars").alias("quality_tier")
    ).write.mode("overwrite").parquet(os.path.join(path, "batch=1"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "batch=0"), os.path.join(path, "batch=1")
    )
    return merged.select("doc_id", "lang", "quality_tier")


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
    FROM documents
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write/read fidelity — Spark's second first-class columnar
    format (Hive-ecosystem interchange; some upstream corpora arrive as
    ORC). Same contract as source_jsonl_roundtrip: write the corpus,
    read it back with an EXPLICIT schema (never infer at 100 TB), and
    prove byte fidelity by hashing text against the source table. ORC
    is a binary columnar format, so unlike the JSONL path this also
    checks integer/string column typing survives the round trip
    (n_chars comes back as the written bigint, not a re-parsed string).
    Spark-native `orc` datasource (zlib stripes, predicate-pushdown
    capable); the oracle reads the ORIGINAL parquet — matching hashes
    mean the two format paths are interchangeable."""
    from disco_spark.session import scratch_dir

    t = load_tables(spark, sf_dir)
    src = t["documents"].select("doc_id", "lang", "source", "n_chars", "text")
    path = scratch_dir("orc_docs", sf_dir)
    src.write.mode("overwrite").orc(path)
    back = spark.read.schema(
        "doc_id bigint, lang string, source string, n_chars bigint, text string"
    ).orc(path)
    return back.select(
        "doc_id", "lang", "source", "n_chars",
        F.md5(F.col("text")).alias("text_md5"),
    )


@query(
    "source_fixed_width",
    oracle="""
    SELECT n_nationkey, n_regionkey, n_name FROM nation
    """,
)
def source_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text interchange — the mainframe/COBOL-era layout
    batch feeds still arrive in: serialize nation rows as
    %04d%04d%-25s records (JVM format_string, one text column), read
    them back as raw lines, and reconstruct the typed columns by
    POSITION (substring + trim + cast — all Catalyst expressions, no
    Python). The oracle reads the original table: matching output
    proves the positional round trip is lossless for in-range values.
    Like every reader here, parsing is schema-explicit — positions and
    widths are the schema."""
    from disco_spark.session import scratch_dir

    t = load_tables(spark, sf_dir)
    src = t["nation"].select(
        F.format_string(
            "%04d%04d%-25s",
            F.col("n_nationkey"),
            F.col("n_regionkey"),
            F.col("n_name"),
        ).alias("value")
    )
    path = scratch_dir("fixed_width_nation", sf_dir)
    src.write.mode("overwrite").text(path)
    back = spark.read.text(path)
    return back.select(
        F.substring("value", 1, 4).cast("int").alias("n_nationkey"),
        F.substring("value", 5, 4).cast("int").alias("n_regionkey"),
        F.rtrim(F.substring("value", 9, 25)).alias("n_name"),
    )


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, md5(text) AS text_md5 FROM documents
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-4180 CSV roundtrip — the one interchange format every
    enterprise handoff still uses: write documents as quoted CSV
    (escape='\"' makes Spark double embedded quotes per RFC 4180
    instead of its legacy backslash default) and read back with an
    EXPLICIT schema + multiLine (fields may contain newlines — which
    also means CSV files are NOT line-splittable; at 100 TB that makes
    CSV a per-file-parallel ingest format, another reason corpora move
    to JSONL/Parquet once inside). Text fidelity through
    quoting/escaping is proven by hashing text against the source
    table, same contract as source_jsonl_roundtrip."""
    from disco_spark.session import scratch_dir

    t = load_tables(spark, sf_dir)
    src = t["documents"].select("doc_id", "lang", "source", "text")
    path = scratch_dir("csv_docs", sf_dir)
    (
        src.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .csv(path)
    )
    back = (
        spark.read.schema(
            "doc_id bigint, lang string, source string, text string"
        )
        .option("header", "true")
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(path)
    )
    return back.select(
        "doc_id", "lang", "source", F.md5(F.col("text")).alias("text_md5")
    )


COMPACT_TARGET_MB = 32


@query(
    "table_compact_small_files",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    """,
)
def table_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance job every
    petabyte lake runs nightly (the OPTIMIZE/rewrite_data_files shape):
    a deliberately fragmented write (48 splinter files) is compacted
    to ceil(bytes / {COMPACT_TARGET_MB} MB) files via coalesce —
    a NARROW dependency, no shuffle: each output task concatenates
    input splits, which is the whole point of a compactor (rewriting
    100 TB through a shuffle would double the job's cost). The file
    count drop is asserted in-function (chunked-ingest convention);
    the oracle proves compaction lost nothing.

    At real scale the same plan runs per partition-directory with the
    target derived from file listings — exactly what this computes —
    and skips partitions already above the floor."""
    import glob
    import math

    t = load_tables(spark, sf_dir)
    src = t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    frag = tempfile.mkdtemp(prefix="disco_spark_frag_")
    src.repartition(48).write.mode("overwrite").parquet(frag)
    files = glob.glob(os.path.join(frag, "part-*.parquet"))
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_target = max(
        1, math.ceil(total_bytes / (COMPACT_TARGET_MB << 20))
    )
    comp = tempfile.mkdtemp(prefix="disco_spark_compact_")
    spark.read.parquet(frag).coalesce(n_target).write.mode(
        "overwrite"
    ).parquet(comp)
    out_files = glob.glob(os.path.join(comp, "part-*.parquet"))
    assert len(out_files) <= n_target < len(files), (
        f"compaction produced {len(out_files)} files "
        f"(target {n_target}) from {len(files)}"
    )
    return spark.read.parquet(comp)
