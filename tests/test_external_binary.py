"""Binary external-program framing (reference external.py:361-476 wire
protocol): length-prefixed frames must round-trip values containing
tabs, newlines, and NULs — exactly what the TSV demo path cannot do.
The C fixture (tests/fixtures/ext_echo.c) proves the protocol is
language-agnostic, mirroring the role of reference tests/test_external.c.
"""

from __future__ import annotations

import shutil
import struct
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

from disco_spark import registry
from disco_spark.operators.external import (
    encode_params_netstring,
    pack_kv,
    pipe_binary,
)
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()

FIXTURES = Path(__file__).parent / "fixtures"

NASTY = [
    (b"k1", b"plain"),
    (b"k\x002", b"tab\there"),
    (b"k3", b"line\nbreak\r\n"),
    (b"k4", b"\x00\x01\x02\xff\xfe"),
    (b"", b""),  # empty key AND value must frame cleanly
]


def _compile_echo(tmpdir: str) -> str | None:
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    out = str(Path(tmpdir) / "ext_echo")
    res = subprocess.run(
        [cc, "-O2", "-o", out, str(FIXTURES / "ext_echo.c")], capture_output=True
    )
    return out if res.returncode == 0 else None


def test_pack_kv_wire_format():
    blob = pack_kv(b"ab", b"x\x00y")
    assert blob == struct.pack("I", 2) + b"ab" + struct.pack("I", 3) + b"x\x00y"


def test_params_netstring_roundtrippable():
    blob = encode_params_netstring({"test1": "1,2,3", "one two three": "dim\ndam\n"})
    head, _, body = blob.partition(b"\n")
    assert int(head) == len(body)
    # length-driven parse (reference netstring.py:28-33 semantics)
    i, seen = 0, {}
    while i < len(body):
        vals = []
        for _ in range(2):
            j = body.index(b" ", i)
            ln = int(body[i:j])
            vals.append(body[j + 1 : j + 1 + ln])
            i = j + 2 + ln
        seen[vals[0]] = vals[1]
    assert seen == {b"test1": b"1,2,3", b"one two three": b"dim\ndam\n"}


def test_binary_roundtrip_nasty_bytes_c_fixture(spark):
    """End-to-end through the compiled C program: every record comes back
    twice (verbatim + byte-reversed value), NULs and newlines intact."""
    with tempfile.TemporaryDirectory() as tmp:
        exe = _compile_echo(tmp)
        if exe is None:
            pytest.skip("no C compiler in environment")
        df = spark.createDataFrame(NASTY, "key binary, value binary").repartition(2)
        out = pipe_binary(
            df, [exe, "checkparams"], params={"test1": "1,2,3", "dummy": "value"}
        )
        rows = [(bytes(r.key), bytes(r.value)) for r in out.collect()]
    expect = []
    for k, v in NASTY:
        expect += [(k, v), (k, v[::-1])]
    assert sorted(rows) == sorted(expect)


def test_c_fixture_rejects_missing_params(spark):
    """**<ERR> from the program surfaces as a task error (reference
    parse_message -> FATAL semantics)."""
    with tempfile.TemporaryDirectory() as tmp:
        exe = _compile_echo(tmp)
        if exe is None:
            pytest.skip("no C compiler in environment")
        df = spark.createDataFrame([(b"k", b"v")], "key binary, value binary").coalesce(1)
        with pytest.raises(Exception, match="(?i)param|exited"):
            pipe_binary(df, [exe, "checkparams"], params={"wrong": "params"}).collect()


def test_python_fixture_one_to_many_groups(spark):
    """A program may emit any group size per record; 3-way fan-out here."""
    script = Path(tempfile.gettempdir()) / "disco_spark_test_triple.py"
    script.write_text(
        "import struct, sys\n"
        "rd, wr = sys.stdin.buffer, sys.stdout.buffer\n"
        "while (c := rd.read(1)) not in (b'', b'\\n'):\n"
        "    pass\n"  # params "0\n"
        "while (head := rd.read(4)):\n"
        "    klen = struct.unpack('I', head)[0]; k = rd.read(klen)\n"
        "    vlen = struct.unpack('I', rd.read(4))[0]; v = rd.read(vlen)\n"
        "    wr.write(struct.pack('I', 3))\n"
        "    for _ in range(3):\n"
        "        wr.write(struct.pack('I', len(k)) + k + struct.pack('I', len(v)) + v)\n"
        "    wr.flush()\n"
    )
    df = spark.createDataFrame([(b"a", b"1"), (b"b", b"2")], "key binary, value binary")
    out = pipe_binary(df, [sys.executable, str(script)])
    rows = [(bytes(r.key), bytes(r.value)) for r in out.collect()]
    assert sorted(rows) == sorted([(b"a", b"1")] * 3 + [(b"b", b"2")] * 3)


def test_external_binary_md5_oracle(spark):
    compare_query(spark, "external_binary_md5", SF_SMOKE)


def test_early_close_kills_subprocess(spark):
    """A consumer that stops mid-stream (limit) must not wedge the task:
    the harness kills the child instead of waiting on a blocked pipe
    (ADVICE round-3, external.py cleanup)."""
    import time

    script = Path(tempfile.gettempdir()) / "disco_spark_test_firehose.py"
    script.write_text(
        "import struct, sys\n"
        "rd, wr = sys.stdin.buffer, sys.stdout.buffer\n"
        "while (c := rd.read(1)) not in (b'', b'\\n'):\n"
        "    pass\n"
        # ignore input; emit far more output than the consumer wants so the
        # child eventually blocks writing to a full, undrained stdout pipe
        "for i in range(200000):\n"
        "    b = str(i).encode()\n"
        "    wr.write(struct.pack('I', 1))\n"
        "    wr.write(struct.pack('I', len(b)) + b + struct.pack('I', 1) + b'v')\n"
    )
    df = spark.createDataFrame([(b"k", b"v")], "key binary, value binary").coalesce(1)
    t0 = time.monotonic()
    got = pipe_binary(df, [sys.executable, str(script)]).limit(3).collect()
    elapsed = time.monotonic() - t0
    assert len(got) == 3
    assert elapsed < 60, f"early close took {elapsed:.1f}s — subprocess not killed"


def test_err_on_stderr_fails_fast_even_if_stdout_open(spark):
    """**<ERR> must terminate the child so the blocked stdout reader sees
    EOF — a program that reports the error but keeps stdout open must not
    hang the task (ADVICE round-3, external.py:129)."""
    import time

    script = Path(tempfile.gettempdir()) / "disco_spark_test_errhang.py"
    script.write_text(
        "import sys, time\n"
        "sys.stdin.buffer.read(2)\n"  # params '0\n'
        "sys.stderr.write('**<ERR> deliberate failure\\n')\n"
        "sys.stderr.flush()\n"
        "time.sleep(600)\n"  # keep stdout open forever
    )
    df = spark.createDataFrame([(b"k", b"v")], "key binary, value binary").coalesce(1)
    t0 = time.monotonic()
    with pytest.raises(Exception, match="deliberate failure"):
        pipe_binary(df, [sys.executable, str(script)]).collect()
    assert time.monotonic() - t0 < 60


def test_rc_failure_includes_stderr_tail(spark):
    """Unprefixed stderr is captured and shown in the rc!=0 error."""
    script = Path(tempfile.gettempdir()) / "disco_spark_test_rcfail.py"
    script.write_text(
        "import sys\n"
        "sys.stdin.buffer.read()\n"
        "sys.stderr.write('diagnostic: flux capacitor missing\\n')\n"
        "sys.exit(3)\n"
    )
    df = spark.createDataFrame([(b"k", b"v")], "key binary, value binary").coalesce(1)
    with pytest.raises(Exception, match="flux capacitor"):
        pipe_binary(df, [sys.executable, str(script)]).collect()
