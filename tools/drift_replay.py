#!/usr/bin/env python3
"""End-to-end replay of a driver testdata regeneration with drifted
physical parquet types — the failure mode that cost round 6 a third of
the catalog (events.ts INT64 NANOS -> TIMESTAMP(MICROS, NTZ)).

Builds a drifted copy of an sf directory, runs graft.Verify against it,
and replays every oracle in DuckDB on the SAME drifted files — proving
both halves of the drift defense at once: the engine's DriftAdapters
coercions AND the oracle SQL's physical-form-agnostic reads (e.g. the
FLOAT[] cast before unnesting embeddings).

Drift forms exercised (one drifted sf dir containing all of them):
  - embeddings.embedding  FLOAT[]        -> DOUBLE[]
  - lineitem measures     DOUBLE         -> DECIMAL(12,2)
  - documents.text/lang   STRING         -> (unchanged; BINARY drift is
                                            DuckDB-unreadable as text,
                                            covered by DriftAdaptersSpec)

events.ts timestamp-form drift is pinned separately (EventsTsDriftSpec,
DriftAdaptersSpec): DuckDB's epoch_ns() binds per physical type, so a
single static oracle SQL cannot replay the un-annotated INT64 form.

Usage: drift_replay.py [srcSfDir]   (default /root/testdata/sf0.001)
"""
import glob
import os
import shutil
import subprocess
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = "/tmp/graft-drift-sf"
OUT = "/tmp/graft-drift-out"

def build_drifted():
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    con = duckdb.connect()
    con.execute(f"""COPY (SELECT * REPLACE (CAST(embedding AS DOUBLE[]) AS embedding)
        FROM '{SRC}/embeddings.parquet') TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT * REPLACE (
          CAST(l_quantity AS DECIMAL(12,2)) AS l_quantity,
          CAST(l_extendedprice AS DECIMAL(12,2)) AS l_extendedprice,
          CAST(l_discount AS DECIMAL(12,2)) AS l_discount,
          CAST(l_tax AS DECIMAL(12,2)) AS l_tax)
        FROM '{SRC}/lineitem.parquet') TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")
    drifted = {"embeddings.parquet", "lineitem.parquet"}
    for f in glob.glob(SRC + "/*.parquet"):
        if os.path.basename(f) not in drifted:
            shutil.copy(f, DST + "/" + os.path.basename(f))

def main():
    build_drifted()
    shutil.rmtree(OUT, ignore_errors=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = subprocess.call(
        ["sbt", "-batch", f"runMain graft.Verify {DST} {OUT}"],
        cwd=repo, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if rc != 0:
        print(f"[drift-replay] Verify failed rc={rc}")
        return rc
    return subprocess.call(
        [sys.executable, os.path.join(repo, "tools", "compare_oracle.py"), DST, OUT])

if __name__ == "__main__":
    sys.exit(main())
