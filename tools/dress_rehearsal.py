import os, sys, time, traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from disco_spark import registry
from disco_spark.session import get_spark
from disco_spark.testing import compare_query
registry.load_all()
spark = get_spark("dress")
names = list(registry.QUERIES)[:50]
fails = []
for i, name in enumerate(names):
    t0 = time.perf_counter()
    try:
        compare_query(spark, name, "/root/testdata/sf0.01")
        print(f"[{i+1}/50] {name}: OK ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as ex:
        fails.append(name)
        print(f"[{i+1}/50] {name}: FAIL {ex}", flush=True)
print("FAILURES:", fails)
spark.stop()
sys.exit(1 if fails else 0)
