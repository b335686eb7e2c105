#!/usr/bin/env python3
"""Compare two per-round bench minima artifacts.

Usage: python3 tools/bench_diff.py BENCH_r09.min.json BENCH_r10.min.json [threshold]

Prints per-query new/old ratios sorted worst-first, the median ratio, and a
non-zero exit if any query regressed beyond the threshold (default 1.25 --
the shared-sandbox noise band; see SURVEY.md §6's measurement note).
Queries present in only one file are listed separately (new/removed gates).
"""
import json
import sys


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    old = json.load(open(old_path))["min"]
    new = json.load(open(new_path))["min"]
    old = {k: float(v) for k, v in old.items()}
    new = {k: float(v) for k, v in new.items()}
    shared = sorted(set(old) & set(new))
    ratios = sorted(((new[q] / old[q], q) for q in shared), reverse=True)
    for r, q in ratios:
        flag = " <-- REGRESSION" if r > threshold else ""
        print(f"{r:6.2f}x  {q}  ({old[q]:.3f}s -> {new[q]:.3f}s){flag}")
    med = sorted(r for r, _ in ratios)[len(ratios) // 2]
    print(f"\n{len(shared)} shared queries; median ratio {med:.2f}x")
    for q in sorted(set(new) - set(old)):
        print(f"new:     {q} ({new[q]:.3f}s)")
    for q in sorted(set(old) - set(new)):
        print(f"removed: {q}")
    regressions = [q for r, q in ratios if r > threshold]
    if regressions:
        print(f"\n{len(regressions)} queries beyond {threshold}x: {', '.join(regressions)}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
