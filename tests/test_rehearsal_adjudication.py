"""The 10x-rehearsal artifacts are self-adjudicating (r13 verdict item
2): every >10x row in BENCH_sf1.json / BENCH_sf1g.json carries a class
from the committed map in tools/adjudication.py, zero rows are
unadjudicated, and this test replays the map against the committed
artifacts so the artifact field and the map can never drift apart.
Pure JSON + map replay — no Spark session."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from adjudication import (  # noqa: E402
    ADJUDICATIONS,
    CLASSES,
    LINE_BAND,
    TAG_OVERRIDES,
    UNADJUDICATED,
    classify,
)

ARTIFACTS = [("sf1", "BENCH_sf1.json"), ("sf1g", "BENCH_sf1g.json")]


def _load(fname):
    path = os.path.join(REPO, fname)
    if not os.path.isfile(path):
        pytest.skip(f"{fname} not present")
    return json.load(open(path))


def test_map_classes_are_valid():
    for name, (cls, why) in ADJUDICATIONS.items():
        assert cls in CLASSES, (name, cls)
        assert why.strip(), f"{name}: adjudication without a reason"
    for (tag, name), (cls, _) in TAG_OVERRIDES.items():
        assert tag in ("sf1", "sf1g"), (tag, name)
        assert cls in CLASSES or cls == UNADJUDICATED, (tag, name, cls)


def test_map_names_are_registered_queries():
    """A typo'd map entry would silently never match a crossing row."""
    from disco_spark import registry

    registry.load_all()
    unknown = [n for n in ADJUDICATIONS if n not in registry.QUERIES]
    assert not unknown, unknown
    unknown = [n for _, n in TAG_OVERRIDES if n not in registry.QUERIES]
    assert not unknown, unknown


@pytest.mark.parametrize("tag,fname", ARTIFACTS)
def test_artifact_over10x_rows_are_adjudicated(tag, fname):
    art = _load(fname)
    assert art["n_unadjudicated"] == 0, art.get("over_10x_classes")
    assert set(art["over_10x_classes"]) == set(art["over_10x"])
    for name in art["over_10x"]:
        row = art["queries"][name]
        assert row["factor"] > 10, (name, row)
        want_cls, want_why = classify(tag, name)
        assert row["class"] == want_cls != UNADJUDICATED, (name, row)
        assert art["over_10x_classes"][name] == want_cls
        assert row.get("why", "") == want_why, name


@pytest.mark.parametrize("tag,fname", ARTIFACTS)
def test_artifact_envelope_consistency(tag, fname):
    """Rows with a second rep: lo <= hi, primary factor inside [lo,hi];
    solid/straddler membership recomputes from the recorded factors."""
    art = _load(fname)
    lo_band, hi_band = LINE_BAND
    for name, row in art["queries"].items():
        if "factor_lo" in row:
            assert row["factor_lo"] <= row["factor"] <= row["factor_hi"], (
                name,
                row,
            )
    recomputed_straddlers = sorted(
        n
        for n, r in art["queries"].items()
        if "factor_lo" in r and r["factor_lo"] <= 10 < r["factor_hi"]
    )
    assert art["line_straddlers"] == recomputed_straddlers
    for n in art["over_10x_solid"]:
        r = art["queries"][n]
        assert r.get("factor_lo", r["factor"] if r["factor"] > hi_band else 0) > 10, (
            n,
            r,
        )
