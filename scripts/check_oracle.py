#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs
each SQL in DuckDB over the parquet tables in <sfDir>, and compares
with the Spark result parquet at <verifyOutDir>/<name>/.

Comparison: sort columns by name, sort rows, exact value match
(floats compared bit-exactly first, then with 1e-9 rel tolerance
reported as WARN so near-misses are visible while iterating).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in order]


def close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return "exact"
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
            return "approx"
        return "diff"
    return "exact" if a == b else "diff"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        try:
            ores = con.execute(sql)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            sres = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # dtype check: the driver hashes typed values; DuckDB widening
        # (e.g. SUM(int) -> HUGEINT vs Spark BIGINT) breaks the hash even
        # when python-level values compare equal. Flag any oracle column
        # type with no parquet/Spark equivalent.
        otypes = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [(r[0], r[1]) for r in otypes
               if r[1] in ("HUGEINT", "UHUGEINT", "UINTEGER", "UBIGINT")]
        if bad:
            print(f"FAIL {name}: oracle dtype not parquet-representable: {bad}"
                  " (CAST the aggregate in the oracle SQL)")
            n_fail += 1
            continue
        og, ocols_s = norm(orows, ocols)
        sg, scols_s = norm(srows, scols)
        if ocols_s != scols_s:
            print(f"FAIL {name}: column mismatch oracle={ocols_s} spark={scols_s}")
            n_fail += 1
            continue
        if len(og) != len(sg):
            print(f"FAIL {name}: row count oracle={len(og)} spark={len(sg)}")
            n_fail += 1
            continue
        status, detail = "PASS", ""
        for i, (a, b) in enumerate(zip(og, sg)):
            for j, (x, y) in enumerate(zip(a, b)):
                c = close(x, y)
                if c == "diff":
                    status = "FAIL"
                    detail = f" row {i} col {ocols_s[j]}: oracle={x!r} spark={y!r}"
                    break
                if c == "approx" and status == "PASS":
                    status = "WARN"
                    detail = f" row {i} col {ocols_s[j]}: oracle={x!r} spark={y!r} (approx only)"
            if status == "FAIL":
                break
        print(f"{status} {name} ({len(og)} rows){detail}")
        if status == "FAIL":
            n_fail += 1
        else:
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
