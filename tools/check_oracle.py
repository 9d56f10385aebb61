#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql.

Mimics the driver's t2 gate: for each query dir written by graft.Verify,
run the corresponding oracle SQL in DuckDB over the same parquet tables,
sort columns by name, sort rows, and compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import json
import math
import os
import sys
import time

import duckdb
import pyarrow.dataset as ds

# Any single oracle mirror slower than this is a budget hazard for the
# driver's t2 gate (the r9 report came back empty because one mirror took
# 621 s). Fail loudly here so it never reaches the driver. The driver's
# gate runs at sf0.01; for sf0.1 stretch runs the training mirrors
# legitimately take longer — override via ORACLE_BUDGET_SEC=60.
ORACLE_BUDGET_SEC = float(os.environ.get("ORACLE_BUDGET_SEC", "10"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Type canary (r15): DuckDB silently promotes SUM(BIGINT) -> HUGEINT and
# integer // chains follow; the driver's hash is TYPE-sensitive, so a
# mirror whose final projection leaks a type outside this allowlist can
# be value-equal yet hash-red (the t142 r14 failure). Every mirror's
# DESCRIBE'd output types must be in this pinned set — anything else
# (HUGEINT, UHUGEINT, UBIGINT, DECIMAL, ...) fails locally, before the
# driver gate ever sees it. CAST aggregates back in the final SELECT.
ALLOWED_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB",
}


def type_canary(con, name, sql):
    """Return a list of (col, duckdb_type) outside the allowlist."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [(c, t) for c, t, *_ in desc
           if t.removesuffix("[]").split("(")[0].strip() not in ALLOWED_TYPES]
    return bad


def collation_canary(con):
    """Pin DuckDB's VARCHAR ordering to binary (codepoint) collation.

    The other silent cross-engine hazard besides type promotion (r16):
    mirrors whose ORDER BY feeds a LIMIT / rank / string_agg depend on
    the engine's string ordering — a DuckDB default-collation change
    (e.g. an ICU or nocase default) would reorder case/punctuation
    while staying value-equal per row, flipping top-k membership and
    hash order silently. Probe: uppercase < '_' < lowercase is the
    codepoint signature any case-folding collation destroys; NULLS LAST
    is DuckDB's ASC default the mirrors were written against. Returns
    a list of (probe, got, want) mismatches.
    """
    bad = []
    # top-level ORDER BY (aggregate-internal ORDER BY bypasses the
    # session default collation, so it would mask the drift)
    got = ",".join(r[0] for r in con.execute(
        "SELECT s FROM (VALUES ('b'),('A'),('a'),('B'),('_'),('Z')) t(s) "
        "ORDER BY s").fetchall())
    want = "A,B,Z,_,a,b"
    if got != want:
        bad.append(("varchar ORDER BY (binary/codepoint)", got, want))
    # case-folding equality is the worse half: it merges GROUP BY keys
    # and DISTINCT values the Spark side keeps separate
    got_eq = con.execute("SELECT 'a' = 'A'").fetchone()[0]
    if got_eq is not False:
        bad.append(("varchar equality (case-sensitive)", got_eq, False))
    got_null = con.execute(
        "SELECT s FROM (VALUES ('b'),(NULL),('A')) t(s) "
        "ORDER BY s LIMIT 1").fetchone()[0]
    if got_null != "A":
        bad.append(("ASC null placement (NULLS LAST default)",
                    got_null, "A"))
    return bad


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
    # self-test hook: ORACLE_COLLATION_SELFTEST=1 flips the session to a
    # case-folding collation to prove the canary actually trips
    if os.environ.get("ORACLE_COLLATION_SELFTEST") == "1":
        con.execute("SET default_collation='nocase'")
    drift = collation_canary(con)
    if drift:
        for probe, got, want in drift:
            print(f"FAIL collation canary: {probe}: got {got!r}, "
                  f"mirrors were written against {want!r} — the DuckDB "
                  f"default collation drifted; every VARCHAR ORDER BY "
                  f"feeding a LIMIT/rank is now suspect")
        return 1
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    total_wall = 0.0
    slow = []
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
            bad_types = type_canary(con, name, sql)
            if bad_types:
                print(f"FAIL {name}: oracle column type(s) outside the "
                      f"pinned allowlist: {bad_types} — CAST back in the "
                      f"final projection (driver hash is type-sensitive)")
                n_fail += 1
                continue
            t0 = time.monotonic()
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            rows = res.fetchall()
            wall = time.monotonic() - t0
            total_wall += wall
            if wall > ORACLE_BUDGET_SEC:
                slow.append((name, wall))
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
            print(f"PASS {name} ({len(got)} rows, {wall:.2f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"oracle wall {total_wall:.1f}s over {n_pass + n_fail} queries")
    if slow:
        for name, wall in slow:
            print(f"SLOW {name}: duckdb mirror took {wall:.1f}s "
                  f"(> {ORACLE_BUDGET_SEC:.0f}s budget) — fix before the "
                  f"driver gate runs (use AS MATERIALIZED for "
                  f"multi-reference CTEs)")
        return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
