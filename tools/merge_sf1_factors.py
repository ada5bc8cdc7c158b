"""Merge the sf0.1 canonical bench detail and an sf1 (10x) rehearsal
detail into BENCH_sf1.json with a per-query 10x scale factor — the
whole-surface dress-rehearsal artifact the performance audit reads.

Usage: python tools/merge_sf1_factors.py [base.json] [scaled.json] [out.json]
Defaults: BENCH_DETAIL.json, BENCH_DETAIL_sf1_raw.json, BENCH_sf1.json.
The out name's stem (sf1 / sf1g / ...) names the scaled artifact in the
metric and note, so the salted and growing-vocab rehearsals can be
recorded side by side.
"""

import json
import sys

base_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
scaled_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL_sf1_raw.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
tag = out_path.rsplit("BENCH_", 1)[-1].split(".json")[0]
base = json.load(open(base_path))
scaled = json.load(open(scaled_path))

factors = {}
for name, t10 in scaled["queries"].items():
    t1 = base["queries"].get(name)
    factors[name] = {
        "sf0.1_sec": t1,
        "sf1_sec": t10,
        "factor": round(t10 / t1, 2) if t1 else None,
    }
missing = sorted(set(base["queries"]) - set(scaled["queries"]))
over10 = sorted(
    (n for n, f in factors.items() if f["factor"] and f["factor"] > 10),
    key=lambda n: -factors[n]["factor"],
)
out = {
    "metric": f"headline_queries_total_{tag}",
    "value": scaled["value"],
    "unit": "sec",
    "sf": 1.0,
    "n_queries": len(scaled["queries"]),
    "skipped": scaled.get("skipped", []),
    "note": (
        f"10x replicated-data dress rehearsal (benchdata/{tag}) over the "
        "FULL headline set; per-query wall factors vs the same-session "
        "sf0.1 run. Queries >10x are adjudicated in PERFORMANCE.md."
    ),
    "aggregate_factor": round(scaled["value"] / base["value"], 2),
    "n_over_10x": len(over10),
    "over_10x": over10,
    "missing_vs_base": missing,
    "queries": factors,
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(
    f"aggregate {out['aggregate_factor']}x for 10x data over "
    f"{out['n_queries']} queries; {len(over10)} over 10x: {over10[:15]}"
)
