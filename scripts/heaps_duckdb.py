#!/usr/bin/env python3
"""DuckDB-side timings for the Heaps-law scale campaign (driver-side
tooling, not engine code): times the heavy family's oracle SQL on a
heaps_<s> dir so the COVERAGE table can show engine-vs-oracle numbers
at every scale, same as the round-5 fixed-vocab run.

Usage: python3 scripts/heaps_duckdb.py <dir> [oracleSqlJson] [queries]
  (defaults: /tmp/verify_out/oracle_sql.json; the heavy family)
Prints "DUCK <query> <seconds>" per query, min of 2 reps, 8 threads.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
HEAVY = ["d01_exact_dedup", "d02_ngram_jaccard", "d03_minhash_lsh",
         "d04_simhash", "d05_fingerprint_groups",
         "d06_embedding_neardup", "d07_components",
         "d08_cross_source_dups", "d09_lsh_quality",
         "s06_decontamination", "t10_unigram_surprisal"]


def main():
    d = sys.argv[1]
    oracle_path = (sys.argv[2] if len(sys.argv) > 2
                   else "/tmp/verify_out/oracle_sql.json")
    queries = sys.argv[3].split(",") if len(sys.argv) > 3 else HEAVY
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for t in TABLES:
        # driver testdata ships Spark-style parquet DIRS; gen_scale.py
        # writes flat single files — accept both
        import os
        p = f"{d}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    for q in queries:
        if q not in oracle:
            print(f"DUCK {q} no_oracle")
            continue
        times = []
        for _ in range(2):
            t0 = time.time()
            con.execute(oracle[q]).fetchall()
            times.append(time.time() - t0)
        print(f"DUCK {q} {min(times):.3f}")


if __name__ == "__main__":
    main()
