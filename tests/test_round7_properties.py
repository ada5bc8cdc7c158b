"""Randomized cross-model checks for round-7 operators: each Spark
plan is verified against an independent pure-Python reference model on
seeded random inputs (the SURVEY §5.3 property-test strategy, sized so
each case is one Spark action)."""

from __future__ import annotations

import datetime
import itertools
import random

import pyspark.sql.functions as F

from disco_spark.operators.sessionize import GAP_SECONDS, sessionize
from disco_spark.similarity.triangles import triangle_counts


def _py_sessions(events, gap):
    """Reference fold: events = [(user, sec)] -> {(user, seq): [secs]}."""
    out = {}
    by_user = {}
    for u, s in sorted(events):
        by_user.setdefault(u, []).append(s)
    for u, secs in by_user.items():
        seq = 0
        prev = None
        for s in secs:
            if prev is None or s - prev > gap:
                seq += 1
            out.setdefault((u, seq), []).append(s)
            prev = s
    return out


def test_sessionize_matches_reference_model(spark):
    rng = random.Random(7)
    for _ in range(3):
        events = [
            (rng.randrange(5), rng.randrange(0, 20000, 100))
            for _ in range(200)
        ]
        base = datetime.datetime(2001, 1, 1)
        df = spark.createDataFrame(
            [(u, base + datetime.timedelta(seconds=s)) for u, s in events],
            "user_id bigint, ts timestamp",
        )
        got = {
            (r.user_id, r.session_seq): (r.n_events, r.session_start, r.session_end)
            for r in sessionize(df, gap_s=900).collect()
        }
        base_s = int(base.replace(tzinfo=datetime.timezone.utc).timestamp())
        want = {
            (u, seq): (len(secs), base_s + min(secs), base_s + max(secs))
            for (u, seq), secs in _py_sessions(events, 900).items()
        }
        assert got == want


def test_triangle_counts_match_bruteforce(spark):
    rng = random.Random(11)
    for _ in range(3):
        nodes = list(range(12))
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(rng.randrange(8, 30))
            }
        )
        eset = set(edges)
        expect: dict[int, int] = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if (a, b) in eset and (b, c) in eset and (a, c) in eset:
                for n in (a, b, c):
                    expect[n] = expect.get(n, 0) + 1
        df = spark.createDataFrame(edges, "u bigint, v bigint")
        got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
        assert got == expect


def test_merge_grains_equals_rebuild_random_cutoffs(spark):
    from disco_spark.operators.rollup import hourly_grains, merge_grains

    rng = random.Random(13)
    base = datetime.datetime(2002, 6, 1)
    rows = [
        (
            base + datetime.timedelta(seconds=rng.randrange(0, 48 * 3600)),
            rng.choice(["a", "b"]),
            rng.random() * 10,
        )
        for _ in range(400)
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    full = sorted(map(tuple, hourly_grains(ev).collect()))
    for _ in range(3):
        cutoff = base + datetime.timedelta(seconds=rng.randrange(0, 48 * 3600))
        merged = merge_grains(
            hourly_grains(ev.filter(F.col("ts") < F.lit(cutoff))),
            hourly_grains(ev.filter(F.col("ts") >= F.lit(cutoff))),
        )
        assert sorted(map(tuple, merged.collect())) == full
