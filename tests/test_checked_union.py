"""The verification ratchet (round-10 VERDICT "Next round" #5): every
oracle-backed driver-contract entry must carry RECENT verification
evidence — a hash-green driver row or a builder full-contract sweep
MATCH within the last K rounds — or be scheduled in the current
50-slot driver window. This turns the window rotation from a
per-round manual chore into a CI invariant: adding an entry without
scheduling it, or letting an old entry's evidence go stale without
re-queueing it, fails the suite.
"""
from __future__ import annotations

import json
import os

import __spark_entry__ as E
from scripts.gen_checked_union import build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 3  # evidence freshness horizon, in rounds


def _union() -> dict:
    return build()


def test_checked_union_file_is_current():
    """The committed CHECKED_UNION.json must match a fresh rebuild from
    the CORRECTNESS_r*.json + SWEEPS.json sources — allowing exactly ONE
    round of staleness (the driver drops CORRECTNESS_r{N}.json after the
    builder's last regen; the next round's builder re-runs
    scripts/gen_checked_union.py as its first ledger step)."""
    path = os.path.join(REPO, "CHECKED_UNION.json")
    assert os.path.exists(path), "run scripts/gen_checked_union.py"
    committed = json.load(open(path))
    fresh = _union()
    if committed == fresh:
        return
    assert fresh["max_round"] - committed["max_round"] <= 1, (
        "CHECKED_UNION.json is more than one round stale — run "
        "scripts/gen_checked_union.py")
    # the committed file must agree with the rebuild on every round it
    # could have seen (no entry's evidence may move backwards)
    for name, rec in committed["entries"].items():
        frec = fresh["entries"].get(name, {"driver": 0, "sweep": 0})
        assert frec["driver"] >= rec["driver"], name
        assert frec["sweep"] >= rec["sweep"], name


def test_every_oracle_entry_verified_recently_or_scheduled():
    """max(driver, sweep) within the last K rounds, or the entry sits
    in the driver's checked window (first 50 queries() slots)."""
    u = _union()
    horizon = u["max_round"] - K + 1
    window = set(list(E.queries().keys())[:50])
    oracle_backed = set(E.oracle_sql()) & set(E.queries())
    stale = []
    for name in sorted(oracle_backed):
        rec = u["entries"].get(name, {"driver": 0, "sweep": 0})
        if max(rec["driver"], rec["sweep"]) < horizon and name not in window:
            stale.append(name)
    assert not stale, (
        f"entries with no verification evidence in rounds >= {horizon} "
        f"and not scheduled in the driver window: {stale}")


def test_never_driver_checked_entries_are_scheduled():
    """Any oracle-backed entry with NO hash-green driver row ever must
    occupy a slot in the current window — first signal beats refresh —
    unless a builder full-contract sweep verified it within the last K
    rounds (the accepted state for entries added after the window was
    pinned; they rotate in next round)."""
    u = _union()
    horizon = u["max_round"] - K + 1
    window = set(list(E.queries().keys())[:50])
    oracle_backed = set(E.oracle_sql()) & set(E.queries())
    never = [n for n in sorted(oracle_backed)
             if u["entries"].get(n, {}).get("driver", 0) == 0]
    missing = [n for n in never
               if n not in window
               and u["entries"].get(n, {}).get("sweep", 0) < horizon]
    assert not missing, (
        f"never-driver-checked entries neither in the 50-slot window "
        f"nor sweep-verified since round {horizon}: {missing}")
