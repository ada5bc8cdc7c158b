"""Python DataSource (Spark 4 V2 API) for the legacy disco netstring
byte-stream format — the MODERN integration path for a custom scheme:
instead of binaryFile + mapInPandas (sources/readers.py), the format
plugs into ``spark.read.format("disco_netstring")`` like any built-in
source, with one input partition per chunk file (the reference's
one-task-per-chunk model, task_io.py:184-249, re-expressed as
DataSourceReader.partitions()).

Why both paths exist: the mapInPandas reader composes inside existing
plans; the DataSource is what a USER of the engine reaches for — a
named format with schema, options, and file-parallel scan planning.
Both share the ONE frame parser (readers.iter_disco_frames), so the
wire format cannot drift between them.

Scale: partitions() lists chunk files on the driver (cheap — DDFS
chunks are 64 MB by convention, so file count ~ bytes/64MB);
each read() streams one file's frames. Predicate/column pushdown is
not implemented (the format is a raw record stream — same posture as
the reference's readers)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from disco_spark.registry import query
from disco_spark.session import load_tables

FORMAT_NAME = "disco_netstring"


class DiscoNetstringDataSource(DataSource):
    """spark.read.format("disco_netstring").load(dir) -> (key, value)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema) -> "DiscoNetstringReader":
        return DiscoNetstringReader(self.options)


class DiscoNetstringReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("disco_netstring requires a path")
        self.path = path

    def partitions(self) -> list[InputPartition]:
        import glob
        import os

        files = sorted(
            f
            for f in glob.glob(os.path.join(self.path, "*"))
            if os.path.isfile(f) and not os.path.basename(f).startswith(
                ("_", ".")
            )
        )
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        from disco_spark.sources.readers import iter_disco_frames

        with open(partition.value, "rb") as fh:
            yield from iter_disco_frames(fh.read())


def register(spark: SparkSession) -> None:
    """Idempotent format registration for this session."""
    spark.dataSource.register(DiscoNetstringDataSource)


@query(
    "source_pyds_netstring",
    oracle="SELECT CAST(doc_id AS VARCHAR) AS key, lang AS value FROM documents",
)
def source_pyds_netstring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the legacy netstring wire format through the
    registered Python DataSource: write documents' (doc_id, lang)
    as '<klen> <key> <vlen> <value>\\n' chunk files, then read them
    back with spark.read.format("disco_netstring") — same bytes, same
    oracle as source_netstring, different (modern, user-facing)
    integration surface. One Spark input partition per chunk file."""
    from disco_spark.sources.readers import write_disco_netstring
    from disco_spark.session import scratch_dir

    t = load_tables(spark, sf_dir)
    # write-then-read-back pattern -> the self-cleaning scratch root
    # (re-runs overwrite in place; a mkdtemp here would leak one temp
    # dir per invocation and put the lazy DataFrame's source outside it)
    path = scratch_dir("pyds_netstring", sf_dir)
    write_disco_netstring(
        t["documents"].select(
            F.col("doc_id").cast("string").alias("key"),
            F.col("lang").alias("value"),
        ),
        path,
    )
    register(spark)
    return spark.read.format(FORMAT_NAME).load(path)
