#!/usr/bin/env python3
"""Round gate: no registry query may silently VANISH between rounds.

Round 7 shipped "129/129 green" while two queries (tick_sessions,
ticks_range_vwap) had broken at analysis time and fallen out of the
report entirely — a green-only correctness file can't show an absence.
This check makes the absence loud: compare the CURRENT key set (the
oracle_sql.json a fresh `graft.Verify` run just wrote) against the
newest committed CORRECTNESS_r*.json, and fail if any previously-graded
key is missing now. Intentional removals must be listed explicitly.

Usage: python3 tools/keyset_gate.py <verifyOutDir> [allowed-removal ...]
Exit 1 if any prior-round key is absent from the current registry.
"""
import glob
import json
import os
import re
import sys


def main(out_dir: str, allowed: set) -> int:
    cur = set(json.load(open(os.path.join(out_dir, "oracle_sql.json"))))
    rounds = sorted(
        glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    if not rounds:
        print("KEYSET-GATE: no prior CORRECTNESS file — nothing to diff")
        return 0
    prev_path = rounds[-1]
    prev = set(json.load(open(prev_path)))
    missing = prev - cur - allowed
    added = cur - prev
    print(f"KEYSET-GATE: prev={os.path.basename(prev_path)} ({len(prev)} keys) "
          f"cur={len(cur)} added={len(added)} removed={len(prev - cur)}")
    if added:
        print("  new keys: " + " ".join(sorted(added)))
    if missing:
        print("FAIL: keys graded last round but ABSENT now (the r7 hole): "
              + " ".join(sorted(missing)))
        print("  (intentional removal? pass the key as an extra argument)")
        return 1
    print("PASS: every prior-round key is still present")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], set(sys.argv[2:])))
