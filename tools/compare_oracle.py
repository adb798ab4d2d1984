#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare with the Spark parquet output that
graft.Verify wrote (columns sorted by name, rows sorted, exact values).

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"[FAIL] {name}: spark output unreadable: {e}")
            n_bad += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"[FAIL] {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"[FAIL] {name}: rows exp={len(exp)} got={len(got)}")
            n_bad += 1
            continue
        bad = None
        for col in exp.columns:
            ev, gv = exp[col].tolist(), got[col].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cells_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"[FAIL] {name}: first diff col={col} row={i} exp={a!r} got={b!r}")
            n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(exp)} rows")
            n_ok += 1

    # rows-only queries: just confirm spark wrote something
    import glob
    import os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracles:
            try:
                n = con.sql(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
                print(f"[rows] {name}: {n} rows (no oracle)")
            except Exception as e:
                print(f"[FAIL] {name}: rows-only output unreadable: {e}")
                n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
