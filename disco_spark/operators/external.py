"""External-program operator: pipe records through a non-Python
executable, the reference's polyglot-UDF mechanism (SURVEY §2.7;
reference lib/disco/worker/classic/external.py:361-476 — stdin/stdout
framing around a per-task subprocess; C fixture tests/test_external.c).

Two framings:

- ``pipe_table``: line/TSV framing over ``rdd.pipe`` — the readable
  demo path for text-safe records.
- ``pipe_binary``: the reference's actual wire protocol, byte-exact
  (external.py:361-476): the worker first sends job ``Params`` as a
  netstring dict (or ``0\\n`` when absent), then each record as
  ``<u32 klen><key><u32 vlen><val>`` (native-endian, like the
  reference's ``struct.pack("I", ...)``); the program replies with
  groups of ``<u32 num>`` followed by ``num`` packed pairs, and may
  emit ``**<MSG>``/``**<ERR>`` lines on stderr. Values containing
  tabs/newlines/NULs survive — the gap TSV framing has.

``pipe_binary`` runs per *partition* via ``mapPartitions`` (one
subprocess per partition, like one per task in the reference), with a
feeder thread writing stdin while the main thread drains stdout — the
same no-deadlock contract the reference got from poll().

OOB (out-of-band) keys (reference lib/disco/task.py:122-145) map to
Spark accumulators: ``pipe_with_metrics`` shows the pattern.
"""

from __future__ import annotations

import struct
import subprocess
import threading

from pyspark.sql import DataFrame, SparkSession

MAX_ITEM_SIZE = 1024**3  # same sanity cap as the reference protocol


# ---------------------------------------------------------------------------
# wire codec (byte-exact vs reference external.py pack_kv/unpack_kv and
# netstring.py encode_netstring_fd)
# ---------------------------------------------------------------------------
def pack_kv(key: bytes, val: bytes) -> bytes:
    """``<u32 klen><key><u32 vlen><val>`` (native-endian u32)."""
    return struct.pack("I", len(key)) + key + struct.pack("I", len(val)) + val


def encode_params_netstring(params: dict[str, str]) -> bytes:
    """Job-parameter framing: ``<total>\\n`` then ``<klen> <k> <vlen> <v>\\n``
    per item (reference netstring.py:36-46). Sent to the program before
    any record; a program reads it once at startup."""
    body = "".join(
        f"{len(str(k))} {k} {len(str(v))} {v}\n" for k, v in params.items()
    )
    return f"{len(body)}\n{body}".encode()


def _read_exact(stream, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = stream.read(n - len(buf))
        if not chunk:
            raise EOFError(f"external program closed stdout mid-frame ({len(buf)}/{n})")
        buf += chunk
    return buf


def _unpack_kv(stdout) -> tuple[bytes, bytes]:
    out = []
    for what in ("key", "value"):
        (length,) = struct.unpack("I", _read_exact(stdout, 4))
        if length > MAX_ITEM_SIZE:
            raise ValueError(f"external {what} size exceeded: {length} bytes")
        out.append(_read_exact(stdout, length))
    return out[0], out[1]


def pipe_binary(
    df: DataFrame,
    argv: list[str],
    *,
    params: dict[str, str] | None = None,
    output_schema: str = "key binary, value binary",
) -> DataFrame:
    """Run ``argv`` once per partition and stream (key, value) byte pairs
    through it using the reference's length-prefixed protocol.

    ``df`` must have exactly two columns coercible to binary. The program
    receives Params (netstring) then packed records; every ``<num>``
    group it emits becomes output rows. Output is (key binary, value
    binary) unless ``output_schema`` overrides it (two columns).
    """
    spark = df.sparkSession
    params_blob = encode_params_netstring(params) if params else b"0\n"

    cols = df.columns
    if len(cols) != 2:
        raise ValueError(f"pipe_binary needs a 2-column frame, got {cols}")
    from pyspark.sql import functions as F

    src = df.select(
        F.col(cols[0]).cast("binary").alias("k"), F.col(cols[1]).cast("binary").alias("v")
    )

    def run_partition(rows):
        proc = subprocess.Popen(
            argv, stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE
        )

        feed_err: list[BaseException] = []

        def feed():
            try:
                proc.stdin.write(params_blob)
                for r in rows:
                    proc.stdin.write(pack_kv(bytes(r[0] or b""), bytes(r[1] or b"")))
                proc.stdin.close()
            except BrokenPipeError:
                pass  # program exited early; surfaced via returncode below
            except BaseException as e:  # noqa: BLE001 — re-raised on main thread
                feed_err.append(e)

        def drain_stderr():
            # reference parse_message: **<MSG> -> status line, **<ERR> ->
            # fatal; anything else passes through to task stderr.
            for line in proc.stderr:
                text = line.decode("utf-8", "replace").rstrip("\n")
                if text.startswith("**<ERR>"):
                    feed_err.append(RuntimeError(f"external program error: {text[7:]}"))
                # **<MSG> lines are progress chatter — dropped (Spark UI
                # owns task status); others fall through silently.

        t_in = threading.Thread(target=feed, daemon=True)
        t_err = threading.Thread(target=drain_stderr, daemon=True)
        t_in.start()
        t_err.start()
        try:
            while True:
                head = proc.stdout.read(4)
                if not head:
                    break
                if len(head) < 4:
                    raise EOFError("truncated group header from external program")
                (num,) = struct.unpack("I", head)
                for _ in range(num):
                    yield _unpack_kv(proc.stdout)
        finally:
            t_in.join(timeout=30)
            t_err.join(timeout=30)
            rc = proc.wait()
            if feed_err:
                raise feed_err[0]
            if rc != 0:
                raise RuntimeError(f"external program {argv[0]} exited rc={rc}")

    out = src.rdd.mapPartitions(run_partition)
    return spark.createDataFrame(out, output_schema)


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
