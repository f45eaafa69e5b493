#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
corresponding oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the same sf tables, and compares: schema (column names), row count, and the
multiset of rows (sorted by all columns, values compared exactly; floats
must match to the last bit unless FLOAT_TOL is set).

Dev-only tool (mirrors the driver harness); the shipped engine is pure
Scala/Spark.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
FLOAT_TOL = 0.0  # driver compare is assumed exact; keep 0


def canon(v):
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    return (type(v).__name__, v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            failures.append((name, f"ERROR {e}"))
            continue
        if sorted(got_cols) != sorted(exp_cols):
            failures.append((name, f"schema: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"))
            continue
        # reorder spark columns into oracle column order; sort with a
        # None-safe key (NULLs first) — Python can't compare None to str
        def skey(row):
            return tuple((v is not None, v) for v in row)
        perm = [got_cols.index(c) for c in exp_cols]
        got_r = sorted((tuple(r[i] for i in perm) for r in got), key=skey)
        exp_r = sorted((tuple(r) for r in exp), key=skey)
        if len(got_r) != len(exp_r):
            failures.append((name, f"rowcount: spark={len(got_r)} oracle={len(exp_r)}"))
            continue
        bad = None
        for a, b in zip(got_r, exp_r):
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if x != y and not (math.isnan(x) and math.isnan(y)):
                        if FLOAT_TOL and abs(x - y) <= FLOAT_TOL:
                            continue
                        bad = (a, b, x, y)
                        break
                elif x != y:
                    bad = (a, b, x, y)
                    break
            if bad:
                break
        if bad:
            failures.append((name, f"value: spark_row={bad[0]} oracle_row={bad[1]} ({bad[2]!r} != {bad[3]!r})"))
        else:
            n_ok += 1
            print(f"OK    {name} ({len(got_r)} rows)")
    for name, msg in failures:
        print(f"FAIL  {name}: {msg}")
    print(f"\n{n_ok}/{len(oracle)} queries match")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
