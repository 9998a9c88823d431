#!/usr/bin/env python3
"""Render the COVERAGE.md growth table from two campaign logs.

Usage:
  python3 scripts/campaign_table.py <lo.log> <lo-label> <hi.log> \
      <hi-label> [data-ratio]

Reads PROFILE lines (heaps_campaign.sh / BenchProfile format), takes
steady state = min of reps 2..N per query — the same rule
bench_guard.py and profile_to_reference.py apply — and prints a
markdown table with a hi/lo growth column plus the data-ratio-
normalized growth (growth / data-ratio; < 1.0 means sub-linear in
data volume). Queries present in only one log are listed separately
so a truncated run is visible, never silently dropped.
"""
import re
import sys


def steady(path):
    out = {}
    for line in open(path):
        m = re.match(r"PROFILE (\S+)\s+([\d. ]+)", line)
        if m:
            times = [float(t) for t in m.group(2).split()]
            out[m.group(1)] = min(times[1:]) if len(times) > 1 else times[0]
    return out


def main():
    lo_path, lo_label, hi_path, hi_label = sys.argv[1:5]
    ratio = float(sys.argv[5]) if len(sys.argv) > 5 else 10.0
    lo, hi = steady(lo_path), steady(hi_path)
    both = sorted(set(lo) & set(hi))
    print(f"| query | {lo_label} steady | {hi_label} steady | "
          f"growth | /data (×{ratio:g}) |")
    print("|---|---|---|---|---|")
    for q in both:
        g = hi[q] / lo[q] if lo[q] > 0 else float("inf")
        print(f"| {q} | {lo[q]:.1f} s | {hi[q]:.1f} s | "
              f"{g:.1f}× | {g / ratio:.2f} |")
    for name, d, other in (("lo", lo, hi), ("hi", hi, lo)):
        only = sorted(set(d) - set(other))
        if only:
            print(f"\nONLY in {name}: {', '.join(only)}")


if __name__ == "__main__":
    main()
