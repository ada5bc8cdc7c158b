"""functools.partial-wrapped job functions (reference tests/test_partial.py):
every classic-API slot — map, map_init, combiner, reduce, reduce_init —
must accept partials, and Params may carry partials too (the reference
shipped these via dPickle; cloudpickle subsumes that, but the contract
deserves its own regression test since partials have no __name__ the way
plain functions do). Functions are defined inside the test so cloudpickle
serializes them by value — the same shipping path user code takes from a
notebook/REPL, which is exactly where the reference's dPickle mattered."""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

from disco_spark.operators.classic import DiscoJob


def test_partial_functions_in_every_slot(spark):
    def foo(x: str, extra: str) -> str:
        return x + extra

    def init(rows, params, extra):
        pass

    def map_(entry, params, extra):
        yield entry + params.foo(extra), 1

    def combiner(key, val, buf, done, params, extra):
        if done:
            return [(k + extra, v) for k, v in buf.items()]
        buf[key] = buf.get(key, 0) + val

    def reduce_(items, out, params, extra):
        acc: dict = {}
        for k, v in items:  # combiner emits one partial per map partition
            acc[k] = acc.get(k, 0) + v
        for k, v in acc.items():
            out.add(k + params.foo(extra), v)

    df = spark.createDataFrame([("k1",), ("k2",), ("k1",)], "value string")
    job = DiscoJob(
        map=partial(map_, extra="a"),
        map_init=partial(init, extra="d"),
        combiner=partial(combiner, extra="b"),
        reduce=partial(reduce_, extra="c"),
        reduce_init=partial(init, extra="e"),
        params=SimpleNamespace(foo=partial(foo, extra="z")),
        partitions=2,
        map_output="key string, value bigint",
        reduce_output="key string, value bigint",
    )
    rows = {(r.key, r.value) for r in job.run(df).collect()}
    # map appends foo('a') = 'az'; combiner flush appends 'b';
    # reduce appends foo('c') = 'cz'
    assert rows == {("k1azbcz", 2), ("k2azbcz", 1)}
