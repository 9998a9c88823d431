#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB-proxy ratio table.

The reference publishes no wall-times (BASELINE.md), so the perf proxy
is DuckDB running the oracle SQL on the same parquet. This tool
automates the comparison the judge performs each round:

  1. reads Spark per-query seconds from bench_out.json (written by
     graft.Bench — run the bench first),
  2. times each oracle SQL in DuckDB (same tables, 8 threads,
     min of N reps) using oracle_sql.json from a graft.Verify dump,
  3. prints a ratio table sorted by Spark time, flagging ratios > 2.

Usage:
  python3 scripts/proxy_ratio.py [sfDir] [oracleSqlJson] [benchOut]
  (defaults: /root/testdata/sf0.1, /tmp/verify_out/oracle_sql.json,
   bench_out.json)
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
REPS = 2


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = (sys.argv[2] if len(sys.argv) > 2
                   else "/tmp/verify_out/oracle_sql.json")
    bench_path = sys.argv[3] if len(sys.argv) > 3 else "bench_out.json"
    with open(oracle_path) as f:
        oracle = json.load(f)
    with open(bench_path) as f:
        spark_times = json.load(f)["queries"]
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rows = []
    duck_total = 0.0
    skipped = sorted(set(oracle) - set(spark_times))
    for name, sql in oracle.items():
        if name not in spark_times:
            continue
        best = None
        for _ in range(REPS):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        duck_total += best
        rows.append((name, spark_times[name], best))
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':30s} {'spark':>7s} {'duckdb':>7s} {'ratio':>6s}")
    for name, s, d in rows:
        ratio = s / d if d > 0 else float("inf")
        # flag only where real data-path time is on the table: below
        # ~0.5 s the ratio is dominated by Spark's fixed ~0.15-0.3 s
        # per-query floor (scheduling + codegen), which amortizes away
        # at scale and is not actionable per-query
        flag = "  <-- >2x" if ratio > 2 and s > 0.5 else ""
        print(f"{name:30s} {s:7.3f} {d:7.3f} {ratio:6.2f}{flag}")
    if skipped:
        print(f"(skipped {len(skipped)} oracle queries absent from "
              f"{bench_path}: {', '.join(skipped)})")
    if not rows or duck_total <= 0:
        # e.g. a stale/partial bench_out whose names don't match the
        # oracle dump — report the mismatch instead of dividing by 0
        print(f"\nno overlapping queries between {bench_path} and "
              f"{oracle_path} (or all DuckDB timings were 0) — "
              "nothing to compare")
        sys.exit(1)
    spark_total = sum(s for _, s, _ in rows)
    print(f"\n{'TOTAL':30s} {spark_total:7.2f} {duck_total:7.2f} "
          f"{spark_total / duck_total:6.2f}")


if __name__ == "__main__":
    main()
