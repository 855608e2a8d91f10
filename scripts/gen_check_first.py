"""Generate the next round's ``_CHECK_FIRST`` driver window.

The rotation rule recorded in round 13 (r12 VERDICT "Next round" #1/#7),
governing from r14 on:

1. never-driver-checked oracle-backed entries first (there should be
   none unless the current round added some), then
2. strictly oldest driver evidence first, ties alphabetical,

drawing from CHECKED_UNION.json (regenerate it first with
``scripts/gen_checked_union.py``) and restricted to oracle-backed
entries so no window slot burns on an ``err:no_oracle`` row.

Prints the 50-name Python list literal to paste into
``__spark_entry__._CHECK_FIRST`` (the membership/size tests in
tests/test_correctness.py pin the paste).

Run from the repo root:
    python scripts/gen_check_first.py
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def main() -> None:
    import __spark_entry__ as E

    union = json.load(open(os.path.join(REPO, "CHECKED_UNION.json")))
    entries = union["entries"]
    oracle_backed = sorted(set(E.oracle_sql()) & set(E._base_queries()))
    missing = [n for n in oracle_backed if n not in entries]
    if missing:
        print(f"# WARNING: {len(missing)} oracle-backed entries absent "
              f"from CHECKED_UNION.json (regen it / record sweeps "
              f"first): {missing}", file=sys.stderr)

    def sort_key(name: str):
        driver = entries.get(name, {}).get("driver", 0)
        return (driver, name)  # 0 (never) sorts first, then oldest

    window = sorted(oracle_backed, key=sort_key)[:WINDOW]
    print("_CHECK_FIRST = [")
    for name in window:
        d = entries.get(name, {}).get("driver", 0)
        tag = "never" if d == 0 else f"r{d}"
        print(f'    "{name}",  # {tag}')
    print("    ]")


if __name__ == "__main__":
    main()
