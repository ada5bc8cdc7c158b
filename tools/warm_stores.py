"""Warm the persisted ann_index + sig_store entries for a dataset —
the rehearsal comparability protocol (PERFORMANCE.md): measured bench
runs happen with ann_index/sig_store WARM on both sides of a
base/scaled pair and knn_graph COLD on both sides (wiped just before),
so the one-time store builds land in the same queries on both sides
instead of whichever consumer happens to run first.

Usage: python tools/warm_stores.py [sf_dir ...]
Runs the headline store-building queries (ann_index_compact_topk,
dedup_incremental_lsh, ann_recall_audit_planted — the last trains the
planted_cells quantizer store) once per dataset through the same noop
sink bench.py uses. knn_graph is NOT touched here — wipe
benchdata/knn_graph yourself immediately before the measured run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from disco_spark import registry  # noqa: E402
from disco_spark.session import get_spark  # noqa: E402

WARMERS = (
    "ann_index_compact_topk",
    "dedup_incremental_lsh",
    "ann_recall_audit_planted",
)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    registry.load_all()
    spark = get_spark("warm_stores")
    for sf_dir in dirs:
        for name in WARMERS:
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{sf_dir}: warmed via {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
