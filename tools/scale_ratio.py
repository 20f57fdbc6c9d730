#!/usr/bin/env python3
"""Compare two Bench JSON outputs (e.g. sf0.1 vs a ScaledFixture sf0.3 run)
and print the per-query scale ratio table for BASELINE.md.

Usage: scale_ratio.py small.json big.json [scale_factor]
  scale_factor: the data-size multiple between the runs (default 3.0).

A query is flagged super-linear when its time ratio exceeds
scale_factor * SLACK (noise + fixed-overhead allowance). Queries under
MIN_SEC in the small run are ratio-noise (fixed overhead dominates) and
are summarized, not listed.
"""
import json
import sys

SLACK = 1.34  # flag at ratio > sf * SLACK (e.g. > 4.0x for a 3x scale-up)
MIN_SEC = 0.5

def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    sf = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    qs, qb = small["queries"], big["queries"]
    shared = sorted(set(qs) & set(qb))
    rows, tiny = [], 0
    for q in shared:
        s, b = qs[q], qb[q]
        if s < 0 or b < 0:
            print(f"FAILED in one run: {q} ({s} / {b})")
            continue
        if s < MIN_SEC and b < MIN_SEC * sf * SLACK:
            # tiny at BOTH scales: fixed overhead dominates the ratio.
            # A query that explodes from sub-threshold to a real time
            # (b large) must still be listed — that is the exact shape
            # this tool hunts.
            tiny += 1
            continue
        rows.append((b / s if s else float("inf"), q, s, b))
    rows.sort(reverse=True)
    print(f"| Query | sf-small (s) | sf-big (s) | Ratio ({sf:g}x data) |")
    print("|---|---|---|---|")
    for r, q, s, b in rows:
        flag = " **super-linear**" if r > sf * SLACK else ""
        print(f"| {q} | {s:.2f} | {b:.2f} | {r:.2f}x{flag} |")
    print(f"\n{tiny} queries under {MIN_SEC}s at small scale omitted "
          f"(fixed overhead dominates); totals: "
          f"{small['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value']/small['value']:.2f}x), "
          f"flag threshold {sf * SLACK:.1f}x")

if __name__ == "__main__":
    main()
