"""Thin CLI surface: jobs/run/oracle over the registry, ddfs verbs over
TagCatalog (reference bin/discocli.py, bin/ddfscli.py analogs)."""

from __future__ import annotations

import io

from disco_spark.cli import main_disco, main_ddfs
from tests.conftest import SF_SMOKE


def _run(main, argv, spark):
    buf = io.StringIO()
    code = main(argv, spark=spark, out=buf)
    return code, buf.getvalue()


def test_disco_jobs_lists_registry(spark):
    code, out = _run(main_disco, ["jobs"], spark)
    assert code == 0
    names = out.splitlines()
    assert any(n.startswith("classic_wordcount") for n in names)
    assert len(names) >= 100


def test_disco_run_query(spark):
    code, out = _run(main_disco, ["run", "group_all_stats", SF_SMOKE], spark)
    assert code == 0
    lines = out.splitlines()
    assert len(lines) == 2  # header + single stats row


def test_disco_oracle_prints_sql(spark):
    code, out = _run(main_disco, ["oracle", "q1_pricing_summary"], spark)
    assert code == 0 and "SELECT" in out.upper()


def test_disco_unknown_query_fails(spark):
    code, _ = _run(main_disco, ["run", "nope"], spark)
    assert code == 1


def test_disco_status(spark):
    code, out = _run(main_disco, ["status"], spark)
    assert code == 0 and "appId:" in out


def test_ddfs_push_cat_attrs_rm_roundtrip(spark, tmp_path):
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    path = str(tmp_path / "blob")
    df.write.parquet(path)
    tag = "cli_test_tag"
    assert _run(main_ddfs, ["push", tag, path], spark)[0] == 0
    assert _run(main_ddfs, ["exists", tag], spark)[0] == 0
    code, out = _run(main_ddfs, ["cat", tag, "-n", "20"], spark)
    assert code == 0 and len(out.splitlines()) == 11
    assert _run(main_ddfs, ["setattr", tag, "owner", "ci"], spark)[0] == 0
    assert _run(main_ddfs, ["getattr", tag, "owner"], spark)[1].strip() == "ci"
    code, out = _run(main_ddfs, ["ls", "cli_test"], spark)
    assert tag in out.splitlines()
    assert _run(main_ddfs, ["rm", tag], spark)[0] == 0
    assert _run(main_ddfs, ["exists", tag], spark)[0] == 1
