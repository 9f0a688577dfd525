"""Guard for the driver's ~50-query check window (ADVICE r3 #1).

The external correctness harness verifies only the first
``registry.CHECK_WINDOW`` queries in dict order; everything past the
window rests on the claim "code unchanged since its last green row".
These tests make that claim mechanical:

- every query whose fingerprint (defining module + transitive
  first-party imports + oracle SQL) differs from
  ``tests/verified_manifest.json`` MUST be pinned in ``CHECK_FIRST``
  (i.e. inside the verified window this round);
- the pinned list must fit the window with margin.

Workflow when this fails after an edit: add the affected queries to
``registry.CHECK_FIRST`` (rotating long-green ones out), then run
``python -m cdc_cascade_spark.registry --regen-manifest``.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from cdc_cascade_spark.registry import (
    CHECK_FIRST,
    CHECK_WINDOW,
    StaleOutOfWindowError,
    all_queries,
    build_manifest,
    query_fingerprints,
)

MANIFEST = Path(__file__).resolve().parent / "verified_manifest.json"


def test_check_first_fits_window_with_margin():
    assert len(CHECK_FIRST) == len(set(CHECK_FIRST)), "duplicate pins"
    assert len(CHECK_FIRST) <= CHECK_WINDOW - 5, (
        "CHECK_FIRST is close to the driver's window size — rotate "
        "long-green queries out so every pin is guaranteed a row"
    )


def test_changed_queries_are_pinned_in_window():
    manifest = json.loads(MANIFEST.read_text())
    current = query_fingerprints()
    window = set(list(all_queries())[:CHECK_WINDOW])
    stale = [
        name
        for name, fp in current.items()
        if manifest.get(name) != fp and name not in window
    ]
    assert not stale, (
        f"queries changed since their last verified green row but NOT in "
        f"this round's check window: {stale} — pin them in "
        f"registry.CHECK_FIRST and regen the manifest "
        f"(python -m cdc_cascade_spark.registry --regen-manifest)"
    )


def test_manifest_covers_every_registered_query():
    manifest = json.loads(MANIFEST.read_text())
    missing = sorted(set(all_queries()) - set(manifest))
    assert not missing, (
        f"no manifest entry for {missing} — regen the manifest after "
        f"pinning them in CHECK_FIRST"
    )


# --- regen safety (r4 verdict #2): regen must never bless a changed
# query the driver will not re-verify this round -------------------------


def test_regen_refuses_out_of_window_change():
    committed = {"a": "fp_a", "b": "fp_b"}
    current = {"a": "fp_a", "b": "fp_b_CHANGED"}
    with pytest.raises(StaleOutOfWindowError, match="b"):
        build_manifest(committed, current, window={"a"})


def test_regen_refuses_new_query_outside_window():
    with pytest.raises(StaleOutOfWindowError, match="brand_new"):
        build_manifest({"a": "fp_a"}, {"a": "fp_a", "brand_new": "x"}, window={"a"})


def test_regen_refreshes_window_and_carries_rest_forward():
    committed = {"a": "old_a", "b": "fp_b", "gone": "fp_gone"}
    current = {"a": "new_a", "b": "fp_b", "c": "fp_c"}
    out = build_manifest(committed, current, window={"a", "c"})
    # in-window: refreshed (a) / added (c); out-of-window: carried (b);
    # deregistered queries drop out (gone)
    assert out == {"a": "new_a", "b": "fp_b", "c": "fp_c"}


def test_every_query_verified_once_or_scheduled():
    """Rotation-cadence floor (r4 verdict #4): a query must either have
    appeared in some round's driver correctness report (it was verified
    at least once — the fingerprint guard then enforces
    unchanged-since-green) or sit inside the current check window
    (scheduled for verification this round). Catches a query added to
    the registry but never queued for the driver's gate."""
    import glob

    seen: set[str] = set()
    for path in glob.glob(str(MANIFEST.parent.parent / "CORRECTNESS_r*.json")):
        seen |= set(json.loads(Path(path).read_text()))
    window = set(list(all_queries())[:CHECK_WINDOW])
    orphans = sorted(set(all_queries()) - seen - window)
    assert not orphans, (
        f"queries never driver-verified and not scheduled this round: "
        f"{orphans} — pin them in CHECK_FIRST"
    )


def test_no_frozen_query_exceeds_the_staleness_budget():
    """Rotation-cadence ceiling (r8 verdict #2, promised in the registry
    docstring): the committed per-round CORRECTNESS files ARE the green
    history, so the "no query drifts more than ~2 rounds past its last
    driver row" target is machine-checkable. Every registered query
    must either sit in the CURRENT window (getting a row this round) or
    have a green row at most 2 report-rounds old (AT the budget is
    legal — that is the cohort the next round's window must absorb,
    listed in BUILD_NOTES' rotation-debt section). Fails only when a
    frozen query is genuinely OVER budget — 3+ reports past its last
    row — which with per-round reports can only happen if a builder
    ignored the rotation debt; the failure then lands in that round's
    fresh pytest run, where the judge sees it."""
    import glob
    import re

    last_green: dict[str, int] = {}
    latest = 0
    for path in glob.glob(str(MANIFEST.parent.parent / "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        latest = max(latest, rnd)
        for name, row in json.loads(Path(path).read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    names = list(all_queries())
    window = set(names[:CHECK_WINDOW])
    overdue = sorted(
        n
        for n in names
        if n not in window
        and n in last_green
        and latest - last_green[n] >= 3
        # >= 3 and not scheduled: past the ≤2-report staleness budget.
        # (>= 2 would also fire during the SAME round's post-report
        # judge run for the exactly-at-budget cohort the NEXT round is
        # supposed to rotate — a false alarm on a legal state.)
    )
    assert not overdue, (
        f"frozen queries overdue for re-verification (last green ≥2 "
        f"reports ago, not in the current window): {overdue} — rotate "
        f"them into CHECK_NEXT/CHECK_FIRST"
    )
