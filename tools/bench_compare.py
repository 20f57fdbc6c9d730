#!/usr/bin/env python3
"""Compare two graft bench JSON artifacts on their COMMON query subset.

Raw totals are not comparable across rounds: the query set grows and
machine noise moves 15% run-to-run (49/68 queries drifted together in one
observed pair of runs). This compares like with like:

  python3 tools/bench_compare.py BENCH_old.json BENCH_new.json

Prints common-subset totals, the per-query deltas beyond a noise floor,
and queries present on only one side. Accepts raw driver captures (strips
anything before the first '{').
"""
import json
import sys

NOISE_FLOOR_SEC = 0.25   # sub-second per-query jitter band (fixed overhead ~0.4s)
NOISE_FLOOR_RATIO = 1.25


def load(path):
    s = open(path).read()
    d = json.loads(s[s.index("{"):])
    if d.get("bench_rev", 1) < 2:
        print(f"warning: {path} is bench_rev<2 (single-pass timing)")
    return d


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    # failed queries are stored as NEGATIVE medians so they can't read as
    # fast runs — honor that here: they have no comparable timing at all
    failed = set(old.get("failed", [])) | set(new.get("failed", []))
    if failed:
        print(f"excluded failed queries ({len(failed)}): "
              f"{', '.join(sorted(failed))}")
    oq = {k: v for k, v in old["queries"].items() if k not in failed}
    nq = {k: v for k, v in new["queries"].items() if k not in failed}
    common = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    co, cn = sum(oq[k] for k in common), sum(nq[k] for k in common)
    if co > 0:
        print(f"common subset ({len(common)} queries): "
              f"{co:.2f}s -> {cn:.2f}s  (x{cn / co:.2f})")
    else:
        print(f"no overlapping queries ({len(common)} common) — "
              "only the added/removed breakdown below applies")
    if only_new:
        print(f"new-only queries ({len(only_new)}): "
              f"{sum(nq[k] for k in only_new):.2f}s total")
        for k in only_new:
            print(f"  + {k:32s} {nq[k]:6.2f}s")
    if only_old:
        print(f"removed queries ({len(only_old)}):")
        for k in only_old:
            print(f"  - {k:32s} {oq[k]:6.2f}s")
    moved = [(nq[k] - oq[k], k) for k in common
             if abs(nq[k] - oq[k]) > NOISE_FLOOR_SEC
             and max(nq[k], oq[k]) / max(min(nq[k], oq[k]), 1e-9)
                 > NOISE_FLOOR_RATIO]
    if moved:
        print("per-query movement beyond noise floor "
              f"(>{NOISE_FLOOR_SEC}s and >{NOISE_FLOOR_RATIO}x):")
        for d, k in sorted(moved, reverse=True):
            print(f"  {k:34s} {oq[k]:6.2f}s -> {nq[k]:6.2f}s ({d:+.2f})")
    else:
        print("no per-query movement beyond the noise floor")
    if common:
        drift = sum(1 for k in common if nq[k] > oq[k])
        print(f"direction: {drift}/{len(common)} common queries slower — "
              f"{'uniform drift (machine noise)' if drift > 0.8 * len(common) or drift < 0.2 * len(common) else 'mixed'}")
    else:
        print("direction: no common queries to compare")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
