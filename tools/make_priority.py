"""Generate the registry PRIORITY list for the next driver window by
verification debt: every query's LAST GREEN round is computed from the
committed CORRECTNESS_r*.json artifacts, and the window is ordered

  1. names passed on argv (this round's semantics changes / brand-new
     queries whose results MUST be re-verified first),
  2. REGRESSED queries — red in their MOST RECENT driver check despite
     an older green row (a live regression must not sort as stale-green),
  3. queries with NO green driver row ever, in registration order,
  4. everything else, oldest-green-round first (ties: registration
     order).

Prints a Python literal to paste over registry.PRIORITY (the whole
surface, fully ordered — nothing left to hand-maintain). A green row =
err is null and rows/schema/hash all matched.

Usage: python tools/make_priority.py [--write] [changed_query ...]
  --write  splice the generated list over registry.PRIORITY in place
           (otherwise print to stdout)
"""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_WINDOW = 50


def max_artifact_round(repo: str) -> int:
    """Newest CORRECTNESS_r*.json round in the working tree."""
    rounds = [
        int(p.rsplit("_r", 1)[1].split(".")[0])
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    ]
    return max(rounds, default=0)


def scan_correctness(
    repo: str, max_round: int | None = None
) -> tuple[dict[str, int], dict[str, int]]:
    """(last_green, last_checked) per query name over every committed
    CORRECTNESS_r*.json. A green row = no err + rows/schema/hash all
    matched; last_checked tracks ANY row, green or red. Pass max_round
    to replay the scan as of an earlier generation (the policy test
    pins registry.PRIORITY_META['max_round'] so a driver artifact
    written AFTER the commit can't retroactively fail the suite)."""
    last_green: dict[str, int] = {}
    last_checked: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        if max_round is not None and rnd > max_round:
            continue
        for name, row in json.load(open(path)).items():
            last_checked[name] = max(last_checked.get(name, 0), rnd)
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, last_checked


def order_window(
    reg_names: list[str],
    last_green: dict[str, int],
    last_checked: dict[str, int],
    changed: list[str],
) -> tuple[list[str], dict[str, str]]:
    """The pure ordering policy: (ordered names, name -> tag). Buckets:
    changed (argv order) > REGRESSED (latest check red despite an older
    green) > never-verified (registration order) > stale greens
    (oldest green round first, ties by registration order)."""
    reg_order = {n: i for i, n in enumerate(reg_names)}
    # A red row in a query's MOST RECENT check is a live regression: it
    # must not sort as "rN-green" stale just because some older round
    # was green. Escalate it ahead of never-verified.
    regressed = {
        n for n, rnd in last_checked.items()
        if rnd > last_green.get(n, -1)
    }
    red = [
        n for n in reg_names
        if n in regressed and n in last_green and n not in changed
    ]
    never = [
        n for n in reg_names
        if n not in last_green and n not in changed
    ]
    stale = sorted(
        (
            n for n in reg_names
            if n in last_green and n not in regressed and n not in changed
        ),
        key=lambda n: (last_green[n], reg_order[n]),
    )
    ordered = changed + red + never + stale
    tags = {}
    for n in ordered:
        tags[n] = (
            "changed" if n in changed
            else "REGRESSED" if n in red
            else "never-verified" if n in never
            else f"r{last_green[n]}-green"
        )
    return ordered, tags


def main() -> None:
    sys.path.insert(0, REPO)
    from disco_spark import registry

    # registration order, not the previous PRIORITY-reordered view
    registry.PRIORITY.clear()
    registry.load_all()

    args = sys.argv[1:]
    write_in_place = "--write" in args
    changed = [a for a in args if a != "--write"]
    unknown = [n for n in changed if n not in registry.QUERIES]
    assert not unknown, f"changed names not registered: {unknown}"

    last_green, last_checked = scan_correctness(REPO)
    ordered, tags = order_window(
        list(registry.QUERIES), last_green, last_checked, changed
    )

    n_red = sum(1 for t in tags.values() if t == "REGRESSED")
    n_never = sum(1 for t in tags.values() if t == "never-verified")
    summary = (
        f"# window ({N_WINDOW}): {len(changed)} changed, {n_red} regressed, "
        f"{min(n_never, max(0, N_WINDOW - len(changed) - n_red))} of "
        f"{n_never} never-verified"
        f"{'' if len(changed) + n_red + n_never >= N_WINDOW else ', rest stale'}"
    )
    lines = ["PRIORITY: list[str] = ["]
    for i, n in enumerate(ordered):
        if i == N_WINDOW:
            lines.append(
                "    # ---- driver window boundary: 50 entries above ----"
            )
        lines.append(f"    {n!r},  # {tags[n]}")
    lines.append("]")
    body = "\n".join(lines) + "\n"

    # generation parameters, recorded next to the list so the policy
    # test replays THIS generation (not whatever artifacts exist later)
    meta_body = (
        "PRIORITY_META: dict = {\n"
        f"    'changed': {changed!r},\n"
        f"    'max_round': {max_artifact_round(REPO)},\n"
        "    'post_window': [],  # names appended after generation\n"
        "}\n"
    )

    if write_in_place:
        reg_path = os.path.join(REPO, "disco_spark", "registry.py")
        reg = open(reg_path).read()
        start = reg.index("PRIORITY: list[str] = [")
        end = reg.index("]\n", start) + 2
        reg = reg[:start] + body + reg[end:]
        if "PRIORITY_META: dict = {" in reg:
            m_start = reg.index("PRIORITY_META: dict = {")
            m_end = reg.index("}\n", m_start) + 2
            reg = reg[:m_start] + meta_body + reg[m_end:]
        else:
            insert_at = reg.index("]\n", reg.index("PRIORITY: list[str]")) + 2
            reg = reg[:insert_at] + meta_body + reg[insert_at:]
        open(reg_path, "w").write(reg)
        print(summary)
        print(f"wrote {len(ordered)} names into {reg_path}")
    else:
        print(summary)
        print(body + meta_body, end="")


if __name__ == "__main__":
    main()
