"""Per-gate driver-evidence freshness ledger, computed from the record.

Reads every CORRECTNESS_r{N}.json in the repo root and emits, per gate,
the latest round in which the driver checked it and whether that check
was green (rows+schema+hash, no err).  The rotation plan in
`__spark_entry__.py` was previously hand-maintained from these files;
this script makes the ledger mechanical so the plan can't drift from
the record.

Usage:  python scripts/freshness.py [--window N]
Prints a vintage histogram, then the gates sorted oldest-evidence-first
(the natural rotation order), and flags any gate whose LATEST check was
not green (there have never been any — zero reds in the ledger).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ledger() -> dict[str, dict]:
    """gate -> {round, green, history: [(round, green), ...]}."""
    out: dict[str, dict] = {}
    # order by the PARSED round number, not filename: lexicographic
    # order lies as soon as round numbers mix digit counts (r100 sorts
    # between r10 and r11), and "latest" keeps the last file visited
    paths = []
    for path in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            paths.append((int(m.group(1)), path))
    for rnd, path in sorted(paths):
        with open(path) as f:
            data = json.load(f)
        for gate, res in data.items():
            green = bool(
                res.get("rows_match")
                and res.get("schema_match")
                # rows-only gates (no oracle SQL) report hash_match null;
                # the driver's weaker check is still a pass when not False
                and res.get("hash_match") is not False
                and not res.get("err")
            )
            rec = out.setdefault(gate, {"history": []})
            rec["history"].append((rnd, green))
            rec["round"] = rnd
            rec["green"] = green
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50, help="driver window size")
    args = ap.parse_args()

    led = ledger()
    sys.path.insert(0, HERE)
    from spark_extension_spark.registry import QUERIES

    live = {g for g in led if g in QUERIES}
    dead = sorted(set(led) - live)
    never = sorted(set(QUERIES) - set(led))

    hist: dict[int, int] = {}
    for g in live:
        hist[led[g]["round"]] = hist.get(led[g]["round"], 0) + 1
    print("vintage histogram (live gates):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")
    print(f"  total live gates with driver evidence: {len(live)}")
    if never:
        print(f"  NEVER driver-checked: {len(never)}: {', '.join(never)}")
    if dead:
        print(f"  (removed/renamed gates with old evidence: {len(dead)})")

    reds = [g for g in live if not led[g]["green"]]
    if reds:
        print(f"\nLATEST CHECK NOT GREEN ({len(reds)}):")
        for g in sorted(reds):
            print(f"  {g} (r{led[g]['round']})")
    else:
        print("\nall live gates green on their latest driver check")

    print(f"\noldest-evidence-first (rotation order, first {args.window}):")
    order = sorted(live, key=lambda g: (led[g]["round"], g))
    for g in order[: args.window]:
        print(f"  r{led[g]['round']:02d}  {g}")


if __name__ == "__main__":
    main()
