"""Classic-worker function library: the same contracts as the reference's
``disco.worker.classic.func`` / ``disco.util`` helpers, re-implemented for
the Spark compat layer (no code copied; cited for parity):

- persistent_hash      -> reference lib/disco/compat.py:46-47
- default_partition    -> reference lib/disco/worker/classic/func.py:128-129
- make_range_partition -> reference lib/disco/worker/classic/func.py:131-141
- nop_map/nop_reduce   -> reference lib/disco/worker/classic/func.py:146-162
- sum_combiner/sum_reduce -> reference lib/disco/worker/classic/func.py:164-184
- kvgroup              -> reference lib/disco/util.py:101-110
- kvify                -> reference lib/disco/util.py:112-113
"""

from __future__ import annotations

from hashlib import md5
from itertools import groupby


def persistent_hash(value) -> int:
    """Stable cross-process hash (md5 of the utf-8/bytes form).

    The reference uses this instead of ``hash()`` so partition assignment
    survives interpreter restarts; we keep the same definition so label
    assignments are reproducible across Spark tasks and rounds.
    """
    if not isinstance(value, bytes):
        value = str(value).encode("utf-8")
    return int(md5(value).hexdigest(), 16)


def default_partition(key, nr_partitions: int, params=None) -> int:
    return persistent_hash(key) % nr_partitions


def make_range_partition(min_val, max_val):
    """Equal-width range partitioner over [min_val, max_val].

    Uses floor bucketing (reference uses ``int(round(...))``, i.e.
    banker's rounding at .5 — we deliberately use floor so the same
    formula is expressible in ANSI SQL for oracle checks; partition
    *balance* semantics are identical).
    """
    width = max_val - min_val

    def partition(key, nr_partitions: int, params=None) -> int:
        i = int((float(int(key) - min_val) / width) * nr_partitions)
        return min(max(i, 0), nr_partitions - 1)

    return partition


def nop_map(entry, params=None):
    yield entry


def nop_reduce(iter, out, params=None):
    for k, v in iter:
        out.add(k, v)


def sum_combiner(key, value, buf, done, params=None):
    if not done:
        buf[key] = buf.get(key, 0) + value
    else:
        return buf.items()


def sum_reduce(iter, params=None):
    buf = {}
    for key, value in iter:
        buf[key] = buf.get(key, 0) + value
    return buf.items()


def kvgroup(kviter):
    """Group values of consecutive equal keys: (k, v)* -> (k, iter(v))*.

    Does not sort first — callers pair it with ``sort=True`` reduce.
    """
    for k, kvs in groupby(kviter, lambda kv: kv[0]):
        yield k, (v for _k, v in kvs)


def kvify(entry):
    return entry if isinstance(entry, tuple) and len(entry) == 2 else (entry, None)


class Params:
    """Immutable-ish per-job parameter bag shipped to every task
    (reference lib/disco/worker/__init__.py:435-451). In Spark this is a
    closure capture — cloudpickle ships it with the UDF; for large
    read-only state prefer ``spark.sparkContext.broadcast``.
    """

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    def __repr__(self):
        items = ", ".join(f"{k}={v!r}" for k, v in sorted(self.__dict__.items()))
        return f"Params({items})"
