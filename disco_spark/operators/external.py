"""External-program operator: pipe records through a non-Python
executable, the reference's polyglot-UDF mechanism (SURVEY §2.7;
reference lib/disco/worker/classic/external.py:361-476 — stdin/stdout
framing around a per-task subprocess; C fixture tests/test_external.c).

Two framings over one shared per-partition subprocess harness:

- ``pipe_table``: line/TSV framing — the text-safe path. Runs one
  subprocess per *partition* via ``mapPartitions`` (not one Python
  round-trip per row).
- ``pipe_binary``: the reference's actual wire protocol, byte-exact
  (external.py:361-476): the worker first sends job ``Params`` as a
  netstring dict (or ``0\\n`` when absent), then each record as
  ``<u32 klen><key><u32 vlen><val>`` (native-endian, like the
  reference's ``struct.pack("I", ...)``); the program replies with
  groups of ``<u32 num>`` followed by ``num`` packed pairs, and may
  emit ``**<MSG>``/``**<ERR>`` lines on stderr. Values containing
  tabs/newlines/NULs survive — the gap TSV framing has.

Lifecycle contract (both framings):

- a feeder thread writes stdin while the main thread drains stdout —
  the same no-deadlock contract the reference got from poll();
- a fatal ``**<ERR>`` stderr line kills the subprocess so the blocked
  stdout reader sees EOF immediately and the error is raised;
- non-protocol stderr lines are forwarded to the task's stderr and a
  bounded tail is included in any rc!=0 failure message;
- if the consumer closes the generator early (``df.limit`` / ``show``
  stopping a ``mapPartitions`` scan) the subprocess is killed rather
  than waited on, so tasks never wedge on a child blocked writing to
  an undrained pipe.

OOB (out-of-band) keys (reference lib/disco/task.py:122-145) map to
Spark accumulators: ``pipe_with_metrics`` shows the pattern.
"""

from __future__ import annotations

import struct
import subprocess
import sys
import threading
from collections import deque
from typing import Callable, Iterator

from pyspark.sql import DataFrame

MAX_ITEM_SIZE = 1024**3  # same sanity cap as the reference protocol
_STDERR_TAIL_LINES = 50


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


def _run_subprocess(
    argv: list[str],
    feed: Callable,
    read_stdout: Callable,
    *,
    shell: bool = False,
) -> Iterator:
    """Shared per-partition subprocess harness.

    ``feed(stdin)`` runs on a thread and must close stdin when done;
    ``read_stdout(stdout)`` is a generator draining stdout on the main
    thread. Handles **<ERR> kill, stderr forwarding, early-close kill,
    and rc checks (see module docstring for the full contract).
    """
    proc = subprocess.Popen(
        argv,
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        shell=shell,
    )

    feed_err: list[BaseException] = []
    stderr_tail: deque[str] = deque(maxlen=_STDERR_TAIL_LINES)

    class _BrokenFeedPipe(Exception):
        """The child's stdin went away (child exited / was killed) — a
        normal termination signal for the feeder, not a user error."""

    class _StdinProxy:
        """Wrap stdin so ONLY write-side failures are downgraded to
        _BrokenFeedPipe. feed() also consumes the Spark row iterator and
        converts values; an OSError/ValueError raised THERE must surface
        as a real error — swallowing it would let the child see a clean
        EOF, exit rc=0, and silently truncate the partition's output."""

        def __init__(self, f):
            self._f = f

        def _guard(self, op, *args):
            try:
                return op(*args)
            except (BrokenPipeError, ValueError, OSError) as e:
                raise _BrokenFeedPipe() from e

        def write(self, data):
            return self._guard(self._f.write, data)

        def flush(self):
            return self._guard(self._f.flush)

        def close(self):
            return self._guard(self._f.close)

    def feeder():
        try:
            feed(_StdinProxy(proc.stdin))
        except _BrokenFeedPipe:
            pass  # program exited / pipe closed early; surfaced via rc below
        except BaseException as e:  # noqa: BLE001 — re-raised on main thread
            feed_err.append(e)
            # source-side failure: the child will never receive the rest
            # of its input — kill it so the main thread's blocked stdout
            # read sees EOF and the recorded error surfaces promptly
            try:
                proc.kill()
            except OSError:
                pass

    def drain_stderr():
        # reference parse_message: **<MSG> -> status line, **<ERR> ->
        # fatal; anything else passes through to the task's stderr.
        for line in proc.stderr:
            text = line.decode("utf-8", "replace").rstrip("\n")
            if text.startswith("**<ERR>"):
                feed_err.append(RuntimeError(f"external program error: {text[7:]}"))
                # Kill so the main thread's blocked stdout read sees EOF
                # immediately instead of waiting for the program to exit.
                try:
                    proc.kill()
                except OSError:
                    pass
                return
            if text.startswith("**<MSG>"):
                continue  # progress chatter — Spark UI owns task status
            stderr_tail.append(text)
            try:
                sys.stderr.write(text + "\n")
            except OSError:
                pass

    t_in = threading.Thread(target=feeder, daemon=True)
    t_err = threading.Thread(target=drain_stderr, daemon=True)
    t_in.start()
    t_err.start()
    completed = False
    try:
        yield from read_stdout(proc.stdout)
        completed = True
    finally:
        # Early consumer close (limit/show): the child may be blocked
        # writing to the now-undrained stdout pipe, which in turn blocks
        # the feeder on a full stdin pipe — kill the child FIRST so the
        # join below returns immediately instead of burning the full
        # timeout per partition.
        if not completed:
            try:
                proc.kill()
            except OSError:
                pass
        t_in.join(timeout=30)
        # A wedged feeder after normal completion: the child may still
        # be blocked — kill it, never wait unboundedly.
        if completed and not t_in.is_alive():
            try:
                rc = proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                rc = proc.wait()
        else:
            try:
                proc.kill()
            except OSError:
                pass
            rc = proc.wait()
        t_err.join(timeout=5)
        for stream in (proc.stdin, proc.stdout, proc.stderr):
            try:
                if stream:
                    stream.close()
            except OSError:
                pass
        if feed_err:
            raise feed_err[0]
        # Only enforce rc on the normal-completion path: during an early
        # generator close we killed the child ourselves, and raising out
        # of a GeneratorExit would mask the consumer's own control flow.
        if completed and rc != 0:
            tail = "\n".join(stderr_tail)
            raise RuntimeError(
                f"external program {argv if shell else argv[0]} exited rc={rc}"
                + (f"; stderr tail:\n{tail}" if tail else "")
            )


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
        def feed(stdin):
            stdin.write(params_blob)
            for r in rows:
                stdin.write(pack_kv(bytes(r[0] or b""), bytes(r[1] or b"")))
            stdin.close()

        def read_stdout(stdout):
            while True:
                head = stdout.read(4)
                if not head:
                    return
                if len(head) < 4:
                    raise EOFError("truncated group header from external program")
                (num,) = struct.unpack("I", head)
                for _ in range(num):
                    yield _unpack_kv(stdout)

        return _run_subprocess(argv, feed, read_stdout)

    out = src.rdd.mapPartitions(run_partition)
    return spark.createDataFrame(out, output_schema)


def _pipe_lines_partition(command: str, lines) -> Iterator[str]:
    """One subprocess per partition; feed text lines in, yield text lines
    out. The scale path for line-framed external programs — replaces the
    old row-at-a-time ``rdd.pipe`` (one Python hop per row)."""

    def feed(stdin):
        for line in lines:
            stdin.write(line.encode("utf-8", "replace") + b"\n")
        stdin.close()

    def read_stdout(stdout):
        for raw in stdout:
            yield raw.decode("utf-8", "replace").rstrip("\n")

    return _run_subprocess(command, feed, read_stdout, shell=True)


def pipe_table(
    df: DataFrame,
    command: str,
    output_schema: str,
    sep: str = "\t",
) -> DataFrame:
    """Pipe rows through `command` (sh syntax), one TSV line per row in,
    one TSV line per row out; parse back into `output_schema` columns.

    One subprocess per partition (mapPartitions), not per row; `command`
    must be present on every worker image. No driver data path.
    """
    spark = df.sparkSession
    n_out = len(spark.createDataFrame([], output_schema).columns)

    def run_partition(rows):
        lines = (
            sep.join("" if v is None else str(v) for v in row) for row in rows
        )
        for out_line in _pipe_lines_partition(command, lines):
            parts = out_line.split(sep)
            yield tuple(parts[:n_out] + [None] * (n_out - len(parts)))

    return spark.createDataFrame(df.rdd.mapPartitions(run_partition), output_schema)


def pipe_with_metrics(df: DataFrame, command: str, output_schema: str):
    """pipe_table + an accumulator counting rows fed to the subprocess —
    the OOB side-channel analog. Returns (result_df, accumulator)."""
    spark = df.sparkSession
    acc = spark.sparkContext.accumulator(0)
    n_out = len(spark.createDataFrame([], output_schema).columns)

    def run_partition(rows):
        def lines():
            for row in rows:
                acc.add(1)
                yield "\t".join("" if v is None else str(v) for v in row)

        for out_line in _pipe_lines_partition(command, lines()):
            parts = out_line.split("\t")
            yield tuple(parts[:n_out] + [None] * (n_out - len(parts)))

    return spark.createDataFrame(df.rdd.mapPartitions(run_partition), output_schema), acc
