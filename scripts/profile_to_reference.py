#!/usr/bin/env python3
"""Convert a BenchProfile / heaps_campaign.sh log into a bench_guard
reference JSON (scripts/bench_reference_{10,1000}x.json format).

Usage:
  python3 scripts/profile_to_reference.py <campaign.log> <scale-tag> \
      <out.json> ["regime note"]

<scale-tag> selects the `=== heaps_<tag> ===` section of a multi-scale
campaign log (pass e.g. `1000x`); a log without section markers is
read whole. Steady state = min of reps 2..N per PROFILE line — the
same rule bench_guard.py applies to its own runs, so a reference
written from a campaign log and one written by `bench_guard.py
--update` are interchangeable.
"""
import json
import re
import sys
import time


def main():
    log_path, tag, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    regime = sys.argv[4] if len(sys.argv) > 4 else (
        f"Heaps {tag} corpus (/tmp/heaps_{tag}, gen_scale.py "
        "seed-fixed), 8 cpus, persist pin, steady state = min reps 2+")
    queries = {}
    in_section = None  # None = no markers seen yet -> read whole file
    for line in open(log_path):
        m = re.match(r"=== heaps_(\S+) ===", line)
        if m:
            in_section = (m.group(1) == tag)
            continue
        if in_section is False:
            continue
        m = re.match(r"PROFILE (\S+)\s+([\d. ]+)", line)
        if m:
            times = [float(t) for t in m.group(2).split()]
            steady = min(times[1:]) if len(times) > 1 else times[0]
            queries[m.group(1)] = round(steady, 3)
    if not queries:
        print(f"no PROFILE lines for section heaps_{tag} in {log_path}")
        sys.exit(1)
    doc = {
        "_recorded": time.strftime("%Y-%m-%d"),
        "_regime": regime,
        "queries": dict(sorted(queries.items())),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(f"wrote {len(queries)} queries -> {out_path}")


if __name__ == "__main__":
    main()
