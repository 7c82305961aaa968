#!/usr/bin/env python3
"""Receipt protocol for the per-round bench tape (PLANS.md r16: "the
scan must list every shared key >1.5x" — r17's fuzzy_join slip showed a
by-hand scan misses keys, so the listing is now mechanical).

Usage: python3 tools/tape_diff.py <prev_tape.json> <new_tape.json> [ratio]
Prints: totals, every shared key whose new/prev ratio exceeds the
threshold (default 1.5), improvements beyond 1/threshold, and the
added/removed key sets. Exit code is always 0 — the receipts are for
the round notes, the judgment stays human.
"""
import json
import sys


def main(prev_path: str, new_path: str, thresh: float) -> int:
    prev = json.load(open(prev_path))["queries"]
    new = json.load(open(new_path))["queries"]
    shared = sorted(set(prev) & set(new))
    pt = sum(prev[k] for k in shared)
    nt = sum(new[k] for k in shared)
    print(f"shared={len(shared)} prev_total={pt:.1f}s new_total={nt:.1f}s "
          f"ratio={nt / pt:.3f}")
    slower = [(new[k] / prev[k], k) for k in shared if new[k] > thresh * prev[k]]
    for r, k in sorted(slower, reverse=True):
        print(f"  SLOWER {r:.2f}x {k}: {prev[k]:.3f} -> {new[k]:.3f} s")
    faster = [(prev[k] / new[k], k) for k in shared if prev[k] > thresh * new[k]]
    for r, k in sorted(faster, reverse=True):
        print(f"  faster {r:.2f}x {k}: {prev[k]:.3f} -> {new[k]:.3f} s")
    added = sorted(set(new) - set(prev))
    removed = sorted(set(prev) - set(new))
    if added:
        print(f"added ({len(added)}): " + " ".join(
            f"{k}={new[k]:.2f}s" for k in added))
    if removed:
        print(f"REMOVED ({len(removed)}): " + " ".join(removed))
    return 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], t))
