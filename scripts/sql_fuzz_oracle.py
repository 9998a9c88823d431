#!/usr/bin/env python3
"""DuckDB replay side of the differential SQL fuzz gate (VERDICT r9
ask #1; driven by graft.SqlFuzzSpec).

Usage:
  python3 scripts/sql_fuzz_oracle.py <fixtureDir> <queriesJson> \
      <sparkOutDir> [tables]

<fixtureDir> holds the fixture parquet — either a dir per table
(t1/t2/t3, written by the spec) or a single file per table
(<t>.parquet, the driver's sf layout); BOTH engines read these same
files. <queriesJson> maps query id -> SQL. <sparkOutDir>/<qid>/
holds Spark's result parquet per query. [tables] is an optional
comma list of view names (default t1,t2,t3 — pass
lineitem,orders,customer,events,nation for the sf profile).

Each SQL runs in DuckDB over the fixture views and is compared with
the Spark parquet using check_oracle.py's exact normalization (sort
columns by name, sort rows, exact values with the 1e-9 float
tolerance counted as pass). Prints one line per query; exits 1 if
any query diverges — with the offending SQL echoed, so a failure is
a ready-made regression case.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_oracle import close, norm  # noqa: E402

import duckdb  # noqa: E402


def main():
    fix_dir, queries_json, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    tables = (sys.argv[4].split(",") if len(sys.argv) > 4
              else ["t1", "t2", "t3"])
    con = duckdb.connect()
    for t in tables:
        single = os.path.join(fix_dir, f"{t}.parquet")
        src = single if os.path.isfile(single) else f"{fix_dir}/{t}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    queries = json.load(open(queries_json))
    n_pass = n_fail = 0
    for qid, sql in sorted(queries.items()):
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            sres = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{qid}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {qid}: exec error: {e}\n  SQL: {sql}")
            n_fail += 1
            continue
        og, ocols_s = norm(orows, ocols)
        sg, scols_s = norm(srows, scols)
        if ocols_s != scols_s:
            print(f"FAIL {qid}: columns duckdb={ocols_s} spark={scols_s}"
                  f"\n  SQL: {sql}")
            n_fail += 1
            continue
        if len(og) != len(sg):
            print(f"FAIL {qid}: rows duckdb={len(og)} spark={len(sg)}"
                  f"\n  SQL: {sql}")
            n_fail += 1
            continue
        bad = ""
        for i, (a, b) in enumerate(zip(og, sg)):
            for j, (x, y) in enumerate(zip(a, b)):
                if close(x, y) == "diff":
                    bad = (f" row {i} col {ocols_s[j]}: "
                           f"duckdb={x!r} spark={y!r}")
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {qid}:{bad}\n  SQL: {sql}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
