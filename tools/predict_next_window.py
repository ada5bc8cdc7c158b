"""Predict NEXT round's driver window so it can be pre-validated
before the round starts (the round-9 pattern: rehearse the predicted
window vanilla-green, and the next drain is de-risked in advance).

Simulates "this round's driver checks all come back green for the
current PRIORITY window" on top of the committed CORRECTNESS_r*.json
history, then replays the ordering policy to print the window the
NEXT `make_priority.py --write` would front.

Usage: python tools/predict_next_window.py [n_to_print] [--validate]
  --validate  additionally run every predicted name against its DuckDB
              oracle at sf0.01 in a VANILLA SparkSession (the driver's
              own config) and report failures — the one-command version
              of the pre-validation rehearsal.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from make_priority import N_WINDOW, max_artifact_round, order_window, scan_correctness  # noqa: E402


def main() -> None:
    from disco_spark import registry

    # the committed window is read BEFORE load_all; the registry dict
    # must then be rebuilt in REGISTRATION order (make_priority.main
    # does the same PRIORITY.clear()) — load_all's finalize_order
    # reorders QUERIES into PRIORITY order, and feeding that reordered
    # view to order_window would change its registration-order
    # tie-breaks, predicting a window the real --write never generates
    window = list(registry.PRIORITY[:N_WINDOW])
    registry.PRIORITY.clear()
    registry.load_all()

    last_green, last_checked = scan_correctness(REPO)
    this_round = max_artifact_round(REPO) + 1
    for n in window:  # assume the pending driver run greens the window
        last_green[n] = this_round
        last_checked[n] = this_round

    reg = list(registry.QUERIES)
    ordered, tags = order_window(reg, last_green, last_checked, [])
    args = [a for a in sys.argv[1:] if a != "--validate"]
    validate = "--validate" in sys.argv[1:]
    n = int(args[0]) if args else N_WINDOW
    predicted = ordered[:n]
    print(
        f"# predicted round-{this_round + 1} window "
        f"(assumes the r{this_round} window greens):"
    )
    for name in predicted:
        print(f"{name}  # {tags[name]}")

    if validate:
        from pyspark.sql import SparkSession

        from disco_spark.testing import compare_query

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        bad = []
        for i, name in enumerate(predicted):
            try:
                compare_query(spark, name, "/root/testdata/sf0.01")
                print(f"{i + 1:3d}/{len(predicted)} OK   {name}", flush=True)
            except Exception as ex:  # noqa: BLE001 — report and continue
                bad.append(name)
                print(
                    f"{i + 1:3d}/{len(predicted)} FAIL {name}: "
                    f"{str(ex)[:200]}",
                    flush=True,
                )
        spark.stop()
        if bad:
            print(f"VALIDATE FAILED ({len(bad)}): {bad}")
        else:
            print(f"VALIDATE OK: {len(predicted)}/{len(predicted)}")
        sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
