"""Merge the sf0.1 canonical bench detail and an sf1 (10x) rehearsal
detail into BENCH_sf1.json with a per-query 10x scale factor — the
whole-surface dress-rehearsal artifact the performance audit reads.

Usage: python tools/merge_sf1_factors.py [base.json] [scaled.json] [out.json] [rep2.json] [base2.json]
Defaults: BENCH_DETAIL.json, BENCH_DETAIL_sf1_raw.json, BENCH_sf1.json.
rep2.json is a second scaled-side rep — either a legacy line-sitter
partial (covers a subset; per-row envelopes only) or a FULL second
leg (same query set; also feeds the aggregate envelope); base2.json a
full second base rep. With full rep2 + base2 every row gets a
factor_lo/factor_hi from the 2x2 rep matrix and the artifact quotes
``aggregate_factor_lo/hi`` (min-total/max-total and max/min): the
aggregate is a ratio of single-shot totals and inherits both legs'
host swings multiplicatively, so it needs the envelope most of all.
The out name's stem (sf1 / sf1g / ...) names the scaled artifact in the
metric and note, so the salted and growing-vocab rehearsals can be
recorded side by side.

Self-adjudication (r13 verdict item): every row whose factor crosses
10x carries a ``class`` + ``why`` from the committed map in
tools/adjudication.py, so the artifact itself distinguishes an
instrument superset or corpus artifact from a real regression. A >10x
row with no committed adjudication writes ``class: unadjudicated`` AND
exits non-zero — under run_rehearsal.sh's ``set -e`` that fails the
rehearsal, forcing a written adjudication for every new crossing.

Envelope (optional 4th arg): a second scaled-side rep of the
line-sitting queries (factor within adjudication.LINE_BAND), produced
by the rehearsal script via SPARK_GRAFT_ONLY. Rows present there get
``sf1_sec_rep2`` + ``factor_lo``/``factor_hi`` and the artifact quotes
over/under-10x membership with the envelope: ``over_10x_solid`` (both
reps over) vs ``line_straddlers`` (the envelope crosses the line —
noise-indistinguishable, the r12->r13 churn class).
"""

import json
import sys

from adjudication import LINE_BAND, UNADJUDICATED, classify

base_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
scaled_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL_sf1_raw.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json"
rep2_path = sys.argv[4] if len(sys.argv) > 4 else None
base2_path = sys.argv[5] if len(sys.argv) > 5 else None
tag = out_path.rsplit("BENCH_", 1)[-1].split(".json")[0]
base = json.load(open(base_path))
scaled = json.load(open(scaled_path))
rep2_full = json.load(open(rep2_path)) if rep2_path else None
rep2 = rep2_full["queries"] if rep2_full else {}
# only a rep2 covering the SAME query set feeds the aggregate
# envelope: a partial leg (SPARK_GRAFT_ONLY line-sitter file, a
# mid-run per-pass checkpoint, a SKIP run) has a total over a
# different set, and dividing such totals would understate the lo
# bound — set equality is the check, not the 'only' marker alone
rep2_is_full = bool(rep2_full) and set(rep2_full["queries"]) == set(
    scaled["queries"]
)
base2_full = json.load(open(base2_path)) if base2_path else None
base2 = base2_full["queries"] if base2_full else {}

factors = {}
for name, t10 in scaled["queries"].items():
    t1 = base["queries"].get(name)
    row = {
        "sf0.1_sec": t1,
        "sf1_sec": t10,
        "factor": round(t10 / t1, 2) if t1 else None,
    }
    if t1 and (name in rep2 or name in base2):
        t10s = [t10] + ([rep2[name]] if name in rep2 else [])
        t1s = [t1] + ([base2[name]] if name in base2 else [])
        if name in rep2:
            row["sf1_sec_rep2"] = rep2[name]
        if name in base2:
            row["sf0.1_sec_rep2"] = base2[name]
        row["factor_lo"] = round(min(t10s) / max(t1s), 2)
        row["factor_hi"] = round(max(t10s) / min(t1s), 2)
    factors[name] = row
missing = sorted(set(base["queries"]) - set(scaled["queries"]))
over10 = sorted(
    (n for n, f in factors.items() if f["factor"] and f["factor"] > 10),
    key=lambda n: -factors[n]["factor"],
)
unadjudicated = []
for n in over10:
    cls, why = classify(tag, n)
    factors[n]["class"] = cls
    if why:
        factors[n]["why"] = why
    if cls == UNADJUDICATED:
        unadjudicated.append(n)
# envelope-quoted membership: "solid" over-10x means both reps over
# the line, OR a single rep far enough above the line band that no
# second rep was warranted; a >10x row inside the band WITHOUT an
# envelope stays off the solid list (re-merges of pre-envelope raws).
def _solid(f: dict) -> bool:
    if "factor_lo" in f:
        return f["factor_lo"] > 10
    return f["factor"] > LINE_BAND[1]


solid = [n for n in over10 if _solid(factors[n])]
straddlers = sorted(
    n
    for n, f in factors.items()
    if "factor_lo" in f and f["factor_lo"] <= 10 < f["factor_hi"]
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
        "sf0.1 run. Every >10x row carries its committed adjudication "
        "class (tools/adjudication.py); *_rep2/factor_lo/factor_hi rows "
        f"got a second scaled rep (line band {LINE_BAND})."
    ),
    "aggregate_factor": round(scaled["value"] / base["value"], 2),
    # with a FULL second rep of both legs the aggregate — itself a
    # ratio of two single-shot totals that inherits both legs' host
    # swings multiplicatively — is quoted as an envelope, not a point
    **(
        {
            "aggregate_factor_lo": round(
                min(scaled["value"], rep2_full["value"])
                / max(base["value"], base2_full["value"]),
                2,
            ),
            "aggregate_factor_hi": round(
                max(scaled["value"], rep2_full["value"])
                / min(base["value"], base2_full["value"]),
                2,
            ),
            "totals_sec": {
                "base_reps": [base["value"], base2_full["value"]],
                "scaled_reps": [scaled["value"], rep2_full["value"]],
            },
        }
        if rep2_is_full and base2_full
        else {}
    ),
    "n_over_10x": len(over10),
    "over_10x": over10,
    "over_10x_classes": {n: factors[n]["class"] for n in over10},
    "n_unadjudicated": len(unadjudicated),
    "over_10x_solid": solid,
    "line_straddlers": straddlers,
    "missing_vs_base": missing,
    "queries": factors,
}
if "ann_planted_recall" in scaled:
    out["ann_planted_recall"] = scaled["ann_planted_recall"]
if "edit_cap_recall" in scaled:
    out["edit_cap_recall"] = scaled["edit_cap_recall"]
with open(out_path, "w") as f:
    json.dump(out, f, indent=1)
print(
    f"aggregate {out['aggregate_factor']}x for 10x data over "
    f"{out['n_queries']} queries; {len(over10)} over 10x: {over10[:15]}"
)
if straddlers:
    print(f"line straddlers (envelope crosses 10x): {straddlers}")
if unadjudicated:
    print(
        f"FAIL: {len(unadjudicated)} >10x rows have NO committed "
        f"adjudication (tools/adjudication.py): {unadjudicated}",
        file=sys.stderr,
    )
    sys.exit(1)
