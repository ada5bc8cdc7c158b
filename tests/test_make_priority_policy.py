"""The driver-window ordering policy (tools/make_priority.py) — the
rotation that decides which 50 queries the round driver verifies. A
bug here silently wastes a whole round's verification slots, so the
pure policy function is unit-tested directly."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_priority import order_window  # noqa: E402


REG = ["q_a", "q_b", "q_c", "q_d", "q_e", "q_f"]


def test_buckets_and_order():
    """changed > regressed > never-verified (registration order) >
    stale greens oldest-first with registration-order ties."""
    last_green = {"q_a": 5, "q_b": 7, "q_c": 5, "q_f": 4}
    last_checked = {"q_a": 5, "q_b": 7, "q_c": 5, "q_f": 4}
    ordered, tags = order_window(REG, last_green, last_checked, ["q_b"])
    # q_d/q_e never verified (registration order); stale: f(r4) then
    # a(r5) then c(r5) — a before c by registration order
    assert ordered == ["q_b", "q_d", "q_e", "q_f", "q_a", "q_c"]
    assert tags["q_b"] == "changed"
    assert tags["q_d"] == tags["q_e"] == "never-verified"
    assert tags["q_f"] == "r4-green"


def test_latest_check_red_escalates_over_stale_green():
    """A query green in r5 but red at its most recent check (r8) is a
    live regression: it must sort ahead of never-verified, never as
    'r5-green' stale (the failure mode the round-8 ADVICE flagged)."""
    last_green = {"q_a": 5, "q_b": 8}
    last_checked = {"q_a": 8, "q_b": 8}  # q_a re-checked r8 and was red
    ordered, tags = order_window(REG, last_green, last_checked, [])
    assert tags["q_a"] == "REGRESSED"
    assert ordered[0] == "q_a"
    assert ordered.index("q_a") < ordered.index("q_c")  # before never
    assert ordered.index("q_a") < ordered.index("q_b")  # before green


def test_never_green_but_checked_red_stays_in_never_bucket():
    """A query that has ONLY red rows (never green) is not double-
    counted by the regression bucket — it drains with never-verified,
    in registration order."""
    last_green = {}
    last_checked = {"q_c": 8}
    ordered, tags = order_window(REG, last_green, last_checked, [])
    assert ordered == REG  # pure registration order, all never-verified
    assert tags["q_c"] == "never-verified"


def test_changed_wins_over_every_other_bucket():
    last_green = {"q_a": 5}
    last_checked = {"q_a": 8}  # regressed AND changed -> changed
    ordered, tags = order_window(REG, last_green, last_checked, ["q_a"])
    assert ordered[0] == "q_a"
    assert tags["q_a"] == "changed"


def test_priority_file_matches_policy_output():
    """The committed registry.PRIORITY must be exactly what the policy
    produced at generation time — i.e. nobody hand-edited the window.
    The generation parameters (changed names, artifact horizon, post-
    window appends) live in registry.PRIORITY_META, written by
    `make_priority --write`, so this test replays THAT generation: a
    driver artifact written after the commit cannot retroactively fail
    the suite (the round-9 cross-round failure mode).

    The replay runs in a FRESH SUBPROCESS because registration order is
    only observable in a fresh interpreter: in-process PRIORITY.clear()
    + load_all() cannot restore it once any query module was imported
    earlier (the module cache skips re-registration), which made this
    test import-order dependent across pytest selections — and made
    the registration-order tie-break comparison circular whenever an
    earlier load_all() had already reordered QUERIES into committed-
    PRIORITY order (the round-10 ADVICE finding)."""
    import json
    import subprocess

    import make_priority as mp

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, repo)
    from disco_spark import registry

    committed = list(registry.PRIORITY)
    meta = registry.PRIORITY_META
    script = (
        "import json, sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        f"sys.path.insert(0, {os.path.join(repo, 'tools')!r})\n"
        "from disco_spark import registry\n"
        "registry.PRIORITY.clear()\n"  # fresh cache: true registration order
        "registry.load_all()\n"
        "import make_priority as mp\n"
        f"lg, lc = mp.scan_correctness({repo!r}, max_round={meta['max_round']!r})\n"
        f"ordered, _ = mp.order_window(list(registry.QUERIES), lg, lc, "
        f"{meta['changed']!r})\n"
        "print(json.dumps(ordered))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        check=True,
        cwd=repo,
    )
    ordered = json.loads(out.stdout.strip().splitlines()[-1])
    # post-generation registrations are APPENDED to the committed list
    # (so they displace no drain slot); the policy, re-run today,
    # interleaves them by registration order instead — compare modulo
    # exactly those names, and require they sit AFTER the window
    post = set(meta["post_window"])
    assert [n for n in committed if n not in post] == [
        n for n in ordered if n not in post
    ]
    for n in post:
        assert committed.index(n) >= mp.N_WINDOW
