"""Print the comma-separated query names whose 10x rehearsal factor
sits inside adjudication.LINE_BAND (within +-25% of the 10x line) —
the set run_rehearsal.sh gives one extra scaled-side rep so over/under
membership carries an envelope instead of a single-shot verdict.

Usage: python tools/line_sitters.py base_detail.json scaled_detail.json
Prints nothing (and exits 0) when no query sits in the band.
"""

import json
import sys

from adjudication import LINE_BAND

base = json.load(open(sys.argv[1]))["queries"]
scaled = json.load(open(sys.argv[2]))["queries"]
lo, hi = LINE_BAND
sitters = sorted(
    n
    for n, t10 in scaled.items()
    if base.get(n) and lo <= t10 / base[n] <= hi
)
if sitters:
    print(",".join(sitters))
