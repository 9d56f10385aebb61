#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql.

Mimics the driver's t2 gate: for each query dir written by graft.Verify,
run the corresponding oracle SQL in DuckDB over the same parquet tables,
sort columns by name, sort rows, and compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # NOTE: deliberately NO -0.0 normalization — the driver's hash
        # distinguishes -0.0 from 0.0, so the local gate must too (the r4
        # p65 failure hid behind a softened compare here).
        return repr(v)
    if hasattr(v, "isoformat"):  # datetime / pandas Timestamp
        return v.isoformat()
    return repr(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
            got_cols = sorted(got_tbl.column_names)
            got = sorted(
                tuple(norm(got_tbl.column(c)[i].as_py())
                      for c in got_cols)
                for i in range(got_tbl.num_rows))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            rows = res.fetchall()
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            want_cols = sorted(cols)
            want = sorted(tuple(norm(r[i]) for i in order) for r in rows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: schema {got_cols} vs {want_cols}")
            n_fail += 1
        elif got != want:
            diffs = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}, "
                  f"first diffs {diffs[:3]}")
            for i in diffs[:2]:
                print(f"  spark : {got[i]}")
                print(f"  duckdb: {want[i]}")
            if len(got) != len(want):
                print(f"  spark head: {got[:1]}")
                print(f"  duck  head: {want[:1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
