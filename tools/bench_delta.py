"""Compare two bench detail artifacts and separate real per-query
movement from host noise, using the artifacts' OWN error bars.

Usage: python tools/bench_delta.py OLD.json NEW.json

Verdict classes per common query:
- REGRESSED / IMPROVED: the two runs' rep envelopes are DISJOINT
  (new min rep > old max rep, or new max < old min). With medians-of-N
  on both sides this is the strongest artifact-native signal available
  — a shift no rep of the other run ever touched.
- regressed? / improved?: envelopes unavailable on one side (single-rep
  artifact) and the median ratio clears FALLBACK_RATIO with EITHER wall
  >= MIN_BASE_SEC (max(old, new), deliberately: a 0.1 s -> 0.6 s move
  crosses INTO the meaningful range and deserves eyes even though its
  base is sub-threshold; only both-sub-0.5 s ratios are pure noise).
  The r12 three-run forensics measured 3-4x per-query swings on
  identical code, so single-shot ratios under ~2.5x carry no signal;
  these rows are flagged for eyes, not asserted.
- everything else: inside the noise band; not listed.

Prints one JSON line: aggregate medians + their ratio, the envelope
totals, and the classified lists. Pure stdlib; no Spark.
"""

from __future__ import annotations

import json
import sys

FALLBACK_RATIO = 2.5
MIN_BASE_SEC = 0.5


def _envelope(art: dict, name: str) -> tuple[float, float] | None:
    """(min, max) over reps when the artifact recorded them."""
    reps = art.get("rep_times", {}).get(name)
    if reps:
        return (min(reps), max(reps))
    return None


def classify(old: dict, new: dict) -> dict:
    common = sorted(set(old["queries"]) & set(new["queries"]))
    out = {
        "n_common": len(common),
        "old_total": round(sum(old["queries"][q] for q in common), 3),
        "new_total": round(sum(new["queries"][q] for q in common), 3),
        "regressed": [],
        "improved": [],
        "regressed_unsure": [],
        "improved_unsure": [],
    }
    out["ratio"] = (
        round(out["new_total"] / out["old_total"], 3) if out["old_total"] else None
    )
    for q in common:
        t_old, t_new = old["queries"][q], new["queries"][q]
        e_old, e_new = _envelope(old, q), _envelope(new, q)
        row = {"query": q, "old": t_old, "new": t_new}
        if e_old and e_new:
            if e_new[0] > e_old[1]:
                out["regressed"].append(row)
            elif e_new[1] < e_old[0]:
                out["improved"].append(row)
        elif max(t_old, t_new) >= MIN_BASE_SEC and min(t_old, t_new) > 0:
            if t_new / t_old >= FALLBACK_RATIO:
                out["regressed_unsure"].append(row)
            elif t_old / t_new >= FALLBACK_RATIO:
                out["improved_unsure"].append(row)
    for k in ("regressed", "improved", "regressed_unsure", "improved_unsure"):
        out[k].sort(key=lambda r: -abs(r["new"] - r["old"]))
        out["n_" + k] = len(out[k])
    return out


def main() -> None:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    print(json.dumps(classify(old, new)))


if __name__ == "__main__":
    main()
