"""Driver-style oracle sweep: compare registered queries against their
DuckDB oracles at sf0.01, exactly like the round driver's correctness
gate.

Usage:
    python tools/dress_rehearsal.py          # first 50 (driver window)
    python tools/dress_rehearsal.py all      # every registered query
    python tools/dress_rehearsal.py 120      # first N
    python tools/dress_rehearsal.py name...  # specific queries
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from disco_spark import registry  # noqa: E402
from disco_spark.session import get_spark  # noqa: E402
from disco_spark.testing import compare_query  # noqa: E402

registry.load_all()
args = sys.argv[1:]
if not args:
    names = list(registry.QUERIES)[:50]
elif args == ["all"]:
    names = list(registry.QUERIES)
elif len(args) == 1 and args[0].isdigit():
    names = list(registry.QUERIES)[: int(args[0])]
else:
    unknown = [a for a in args if a not in registry.QUERIES]
    assert not unknown, f"unknown queries: {unknown}"
    names = args

spark = get_spark("dress")
fails = []
for i, name in enumerate(names):
    t0 = time.perf_counter()
    try:
        compare_query(spark, name, "/root/testdata/sf0.01")
        print(
            f"[{i + 1}/{len(names)}] {name}: OK "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    except Exception as ex:
        fails.append(name)
        print(f"[{i + 1}/{len(names)}] {name}: FAIL {ex}", flush=True)
print("FAILURES:", fails)
spark.stop()
sys.exit(1 if fails else 0)
