#!/usr/bin/env python3
"""sf1 relational-tier generator (driver-side tooling, not engine code).

VERDICT r9 ask #2: push the oracle-gated scale frontier to sf1
(~6M lineitem). No network => no duckdb tpch extension, so sf1 is
derived from the driver's own sf0.1 parquet by key-offset replication:
each fact/dim table is laid out as `mult` disjoint key universes
(copy i shifts every key by i*stride where stride = max_key+1 of the
base), preserving referential integrity (orders.o_custkey,
lineitem.{l_orderkey,l_partkey,l_suppkey}, events.user_id) and every
per-copy distribution exactly.

Two deterministic de-degeneracy transforms keep the scaled corpus from
being a pathological 10-way clone (which would manufacture exact tie
classes in every aggregate that the base data does not have):
- measures (prices, balances, quantities, values) get a per-(copy,row)
  jitter of at most +-0.1 cents-scale, far below any predicate
  boundary's natural resolution but enough to break exact clone ties;
- dates/timestamps shift by a small per-copy constant (days for the
  relational tables, 31*i days for events so copies occupy disjoint
  session windows; user_id universes are disjoint anyway).

Both engines of the oracle gate read the SAME parquet, so these
transforms affect realism only, never comparability.

Usage: python3 scripts/gen_sf1.py <outDir> [mult=10]
(documents/embeddings are NOT written here -- generate them with
 gen_scale.py heaps mode first; this script overwrites the relational
 + events tables it owns and copies region/nation.)
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
# per-copy day shifts (copy 0 stays exactly the base data)
DAY_SHIFT = [0, 3, -2, 5, -4, 7, -6, 9, -8, 11, -10, 2, -1, 4, -3, 6]


def jitter(copy, n, scale=1e-3):
    """Deterministic per-(copy,row) jitter in (-scale, scale)."""
    h = (np.arange(n, dtype=np.uint64) * np.uint64(40503)
         + np.uint64(copy) * np.uint64(2654435761)) % np.uint64(2001)
    return (h.astype(np.float64) - 1000.0) * (scale / 1000.0)


def shift_ts(col, days):
    return pa.array(col.to_numpy(zero_copy_only=False)
                    + np.timedelta64(days, "D"), type=col.type)


def replicate(tbl, mult, copy_fn):
    return pa.concat_tables([copy_fn(tbl, i) for i in range(mult)])


def main():
    out = sys.argv[1]
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    t = {n: pq.read_table(os.path.join(BASE, f"{n}.parquet"))
         for n in ["customer", "supplier", "part", "orders",
                   "lineitem", "events"]}
    strides = {
        "cust": t["customer"].num_rows, "supp": t["supplier"].num_rows,
        "part": t["part"].num_rows, "ord": t["orders"].num_rows,
        "ev": t["events"].num_rows,
        "user": int(pa.compute.max(t["events"]["user_id"]).as_py()) + 1,
    }

    def cust(tbl, i):
        n = tbl.num_rows
        key = tbl["c_custkey"].to_numpy() + i * strides["cust"]
        return pa.table({
            "c_custkey": pa.array(key, pa.int64()),
            "c_name": pa.array([f"Customer#{k:09d}" for k in key]),
            "c_nationkey": tbl["c_nationkey"],
            "c_acctbal": pa.array(
                np.round(tbl["c_acctbal"].to_numpy() + jitter(i, n), 4)),
            "c_mktsegment": tbl["c_mktsegment"]})

    def supp(tbl, i):
        n = tbl.num_rows
        key = tbl["s_suppkey"].to_numpy() + i * strides["supp"]
        return pa.table({
            "s_suppkey": pa.array(key, pa.int64()),
            "s_name": pa.array([f"Supplier#{k:09d}" for k in key]),
            "s_nationkey": tbl["s_nationkey"],
            "s_acctbal": pa.array(
                np.round(tbl["s_acctbal"].to_numpy() + jitter(i, n), 4))})

    def part(tbl, i):
        n = tbl.num_rows
        return pa.table({
            "p_partkey": pa.array(
                tbl["p_partkey"].to_numpy() + i * strides["part"], pa.int64()),
            "p_name": tbl["p_name"], "p_brand": tbl["p_brand"],
            "p_type": tbl["p_type"], "p_size": tbl["p_size"],
            "p_retailprice": pa.array(
                np.round(tbl["p_retailprice"].to_numpy() + jitter(i, n), 4))})

    def orders(tbl, i):
        n = tbl.num_rows
        return pa.table({
            "o_orderkey": pa.array(
                tbl["o_orderkey"].to_numpy() + i * strides["ord"], pa.int64()),
            "o_custkey": pa.array(
                tbl["o_custkey"].to_numpy() + i * strides["cust"], pa.int64()),
            "o_orderstatus": tbl["o_orderstatus"],
            "o_totalprice": pa.array(np.round(
                tbl["o_totalprice"].to_numpy() + jitter(i, n, 1e-2), 4)),
            "o_orderdate": shift_ts(tbl["o_orderdate"].combine_chunks(),
                                    DAY_SHIFT[i]),
            "o_orderpriority": tbl["o_orderpriority"]})

    def lineitem(tbl, i):
        n = tbl.num_rows
        return pa.table({
            "l_orderkey": pa.array(
                tbl["l_orderkey"].to_numpy() + i * strides["ord"], pa.int64()),
            "l_partkey": pa.array(
                tbl["l_partkey"].to_numpy() + i * strides["part"], pa.int64()),
            "l_suppkey": pa.array(
                tbl["l_suppkey"].to_numpy() + i * strides["supp"], pa.int64()),
            "l_linenumber": tbl["l_linenumber"],
            "l_quantity": tbl["l_quantity"],
            "l_extendedprice": pa.array(np.round(
                tbl["l_extendedprice"].to_numpy() + jitter(i, n, 1e-2), 4)),
            "l_discount": tbl["l_discount"], "l_tax": tbl["l_tax"],
            "l_returnflag": tbl["l_returnflag"],
            "l_linestatus": tbl["l_linestatus"],
            "l_shipdate": shift_ts(tbl["l_shipdate"].combine_chunks(),
                                   DAY_SHIFT[i])})

    def events(tbl, i):
        n = tbl.num_rows
        return pa.table({
            "event_id": pa.array(
                tbl["event_id"].to_numpy() + i * strides["ev"], pa.int64()),
            "ts": shift_ts(tbl["ts"].combine_chunks(), 31 * i),
            "user_id": pa.array(
                tbl["user_id"].to_numpy() + i * strides["user"], pa.int64()),
            "event_type": tbl["event_type"],
            "value": pa.array(np.round(np.maximum(
                tbl["value"].to_numpy() + jitter(i, n), 0.0), 4)),
            "props": tbl["props"]})

    for name, fn in [("customer", cust), ("supplier", supp),
                     ("part", part), ("orders", orders),
                     ("lineitem", lineitem), ("events", events)]:
        out_tbl = replicate(t[name], mult, fn)
        # 65536-row groups keep the single-file sf1 fixtures
        # splittable under Sessions.local's 16m scan floor (see
        # gen_scale.py; layout-only, identical data)
        pq.write_table(out_tbl, os.path.join(out, f"{name}.parquet"),
                       row_group_size=65536)
        print(f"  {name}: {out_tbl.num_rows} rows")
    for name in ["region", "nation"]:
        shutil.copyfile(os.path.join(BASE, f"{name}.parquet"),
                        os.path.join(out, f"{name}.parquet"))
    print(f"wrote sf1-tier relational tables to {out} (mult={mult})")


if __name__ == "__main__":
    main()
