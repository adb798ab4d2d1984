#!/usr/bin/env python3
"""sf1 (100x-gate) oracle sweep driver: one DuckDB subprocess per query
(the single-process form accumulates allocator state and phantom-OOMs on
this node), 40 GB memory limit + spill dir, per-query timeout. Queries
whose replay exceeds the timeout are listed for the invariant checker
(tools/sf1_invariants.py) instead of being silently skipped.

Usage: sf1_sweep.py <verifyOutDir> <sf1Dir> [timeout_s] [only,names]
"""
import json
import subprocess
import sys
import time

WORKER = r'''
import duckdb, json, sys, hashlib
outdir, sf1dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
con.execute("SET memory_limit='40GB'")
con.execute("SET threads=8")
con.execute("SET temp_directory='/tmp/duckspill'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf1dir}/{t}.parquet/*.parquet'")
    except Exception:
        pass
spark = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
ora = con.execute(oracle[name]).df()
sc, oc = sorted(spark.columns), sorted(ora.columns)
# the driver-gate comparison: rows sorted, float cells within rel 1e-9
# (same tolerance as tools/compare_oracle.py — a ULP of summation-order
# drift across millions of rows must not read as a mismatch)
import math
def sort_key(row):
    # Non-float cells lead verbatim; float cells join COARSELY rounded
    # (7 significant digits) so a within-tolerance (rel 1e-9) engine
    # difference cannot reorder ties and misalign the zip below (a
    # stringified exact float in the key could sort two otherwise-equal
    # rows to different positions on the spark vs oracle side and report
    # a spurious MISMATCH on rows that match within tolerance). Floats
    # still participate so rows identical in key columns but genuinely
    # different in value columns order consistently; the residual risk —
    # a pair within 1e-9 straddling a 7th-significant-digit rounding
    # boundary — is a loud false MISMATCH, never a silent pass.
    # -0.0 normalizes to 0.0 (f-format keeps the sign, which would split
    # a tolerance-equal pair across the two sides); the full-precision
    # repr rides as a FINAL tie-break so rows equal to 7 digits but
    # genuinely different (beyond tolerance) still order consistently on
    # both sides — their exact values differ in the same direction on
    # each side whenever the cross-side noise is << the in-group gap.
    return tuple(
        (1, "nan", "") if isinstance(x, float) and math.isnan(x)
        else (1, f"{x if x != 0 else 0.0:.6e}", repr(x)) if isinstance(x, float)
        else (0, str(x), "") for x in row)
def rows_of(df, cols):
    return sorted(df[cols].itertuples(index=False, name=None), key=sort_key)
def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        except (TypeError, ValueError):
            pass
    return str(a) == str(b)
ra, rb = rows_of(spark, sc), rows_of(ora, oc)
match = len(ra) == len(rb) and all(
    all(eq(x, y) for x, y in zip(r1, r2)) for r1, r2 in zip(ra, rb))
print(json.dumps({"rows": [len(spark), len(ora)], "schema": sc == oc,
                  "hash": match}))
'''


def main():
    outdir, sf1dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, "-c", WORKER, outdir, sf1dir, name],
                capture_output=True, text=True, timeout=timeout)
            el = time.time() - t0
            if p.returncode == 0:
                r = json.loads(p.stdout.strip().splitlines()[-1])
                ok = r["schema"] and r["hash"] and r["rows"][0] == r["rows"][1]
                results[name] = {"status": "hash-green" if ok else "MISMATCH",
                                 **r, "sec": round(el, 1)}
            else:
                err = (p.stderr or "").strip().splitlines()
                results[name] = {"status": "ERROR", "sec": round(el, 1),
                                 "err": err[-1] if err else "?"}
        except subprocess.TimeoutExpired:
            results[name] = {"status": "TIMEOUT", "sec": timeout}
        r = results[name]
        print(f"[sf1] {name:24s} {r['status']:10s} {r['sec']:>7}s "
              f"{r.get('rows','')}", flush=True)
    with open(f"{outdir}/sf1_sweep.json", "w") as f:
        json.dump(results, f, indent=1)
    n_ok = sum(1 for r in results.values() if r["status"] == "hash-green")
    print(f"== {n_ok}/{len(results)} hash-green; "
          f"heavy/err: {[k for k, r in results.items() if r['status'] != 'hash-green']}")


if __name__ == "__main__":
    main()
