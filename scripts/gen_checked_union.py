"""Generate CHECKED_UNION.json — the per-entry verification ledger.

For every oracle-backed entry in the driver contract, records:

* ``driver``: the latest round whose ``CORRECTNESS_r*.json`` has a
  full hash-green driver row for the entry (0 = never driver-checked;
  the driver window covers only the first 50 ``queries()`` entries per
  round, so rotation closes this over rounds).
* ``sweep``: the latest round with a builder-run full-contract sweep
  (the ``/verify`` skill's driver-contract loop at sf0.01) recording
  MATCH for the entry, from ``SWEEPS.json`` (round -> [entries]).

``tests/test_checked_union.py`` turns this file into a ratchet: every
oracle-backed entry must be verified (driver or sweep) within the last
K rounds or be scheduled in the current driver window — so window
rotation is enforced by CI instead of being a per-round chore
(round-10 VERDICT "Next round" #5).

Run from the repo root after each round's CORRECTNESS file lands:
    python scripts/gen_checked_union.py
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> dict:
    driver: dict[str, int] = {}
    max_round = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        max_round = max(max_round, rnd)
        for name, row in json.load(open(f)).items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                driver[name] = max(driver.get(name, 0), rnd)
    sweep: dict[str, int] = {}
    sweeps_path = os.path.join(REPO, "SWEEPS.json")
    if os.path.exists(sweeps_path):
        for rnd_s, entries in json.load(open(sweeps_path)).items():
            rnd = int(rnd_s)
            max_round = max(max_round, rnd)
            for name in entries:
                sweep[name] = max(sweep.get(name, 0), rnd)
    names = sorted(set(driver) | set(sweep))
    return {
        "max_round": max_round,
        "entries": {
            n: {"driver": driver.get(n, 0), "sweep": sweep.get(n, 0)}
            for n in names
        },
    }


if __name__ == "__main__":
    out = build()
    path = os.path.join(REPO, "CHECKED_UNION.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n = len(out["entries"])
    nd = sum(1 for v in out["entries"].values() if v["driver"] > 0)
    print(f"CHECKED_UNION.json: {n} entries, {nd} driver-green, "
          f"max_round={out['max_round']}", file=sys.stderr)
