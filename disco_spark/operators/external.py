"""External-program operator: pipe records through a non-Python
executable, the reference's polyglot-UDF mechanism (SURVEY §2.7;
reference lib/disco/worker/classic/external.py:361-476 — stdin/stdout
framing around a per-task subprocess; C fixture tests/test_external.c).

Spark-first: ``rdd.pipe(cmd)`` runs the command once per partition and
streams lines through it — the executor-side subprocess pattern the
reference used, with Spark owning retries/placement. Records are
TSV-framed (the reference used length-prefixed binary; TSV keeps the
demo readable — swap the framing functions for binary protocols).

OOB (out-of-band) keys (reference lib/disco/task.py:122-145) map to
Spark accumulators: ``pipe_with_metrics`` shows the pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def pipe_table(
    df: DataFrame,
    command: str,
    output_schema: str,
    sep: str = "\t",
) -> DataFrame:
    """Pipe rows through `command` (sh syntax), one TSV line per row in,
    one TSV line per row out; parse back into `output_schema` columns.

    The subprocess runs per partition on executors (no driver data
    path); `command` must be present on every worker image.
    """
    spark = df.sparkSession
    n_out = len(spark.createDataFrame([], output_schema).columns)

    def to_line(row) -> str:
        return sep.join("" if v is None else str(v) for v in row)

    piped = df.rdd.map(to_line).pipe(command)

    def parse(line: str) -> tuple:
        parts = line.split(sep)
        return tuple(parts[:n_out] + [None] * (n_out - len(parts)))

    return spark.createDataFrame(piped.map(parse), output_schema)


def pipe_with_metrics(df: DataFrame, command: str, output_schema: str):
    """pipe_table + an accumulator counting rows fed to the subprocess —
    the OOB side-channel analog. Returns (result_df, accumulator)."""
    spark = df.sparkSession
    acc = spark.sparkContext.accumulator(0)

    def to_line(row) -> str:
        acc.add(1)
        return "\t".join("" if v is None else str(v) for v in row)

    n_out = len(spark.createDataFrame([], output_schema).columns)
    piped = df.rdd.map(to_line).pipe(command)

    def parse(line: str) -> tuple:
        parts = line.split("\t")
        return tuple(parts[:n_out] + [None] * (n_out - len(parts)))

    return spark.createDataFrame(piped.map(parse), output_schema), acc
