#!/usr/bin/env python3
"""Invariant-level sf1 verdict for catalog rows whose full hash replay is
oracle-side-infeasible at sf1 (currently exactly one: dd_minhash, whose
replay re-derives every xxhash64 per character in SQL — hours at 50k
docs). The checks recompute everything EXCEPT the seeded hash family
from the raw sf1 tables:

  dd_minhash:
   V1 validity  — every output pair's exact 3-gram Jaccard, recomputed
                  from the documents table with the engine's tokenizer
                  (lower, split [^a-z0-9]+, 3-gram join " "), equals the
                  engine's jaccard (rel 1e-9) and clears the threshold.
   V2 coverage  — every identical-text pair (same md5, ≥3 tokens) must
                  appear: identical docs have identical signatures in
                  every band, so missing one would be an engine bug, not
                  a recall accident.
   V3 shape     — a_id < b_id, no duplicate pairs.

What this does NOT check (and the hash replay at the gate SFs does):
that the candidate set is exactly the banded-signature set — i.e. a
pair the bands never produced but that clears the threshold is invisible
here (that is LSH recall, bounded separately by RecallInvariantsSpec).

Usage: sf1_invariants.py <verifyOutDir> <sf1Dir>
"""
import sys

import duckdb

THRESHOLD = 0.5


def main():
    outdir, sf1dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET memory_limit='40GB'")
    con.execute("SET temp_directory='/tmp/duckspill'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf1dir}/documents.parquet/*.parquet'")
    con.execute(f"CREATE VIEW mh AS SELECT * FROM '{outdir}/dd_minhash/*.parquet'")

    n_pairs, n_dup, bad_order = con.execute("""
        SELECT count(*),
               count(*) - count(DISTINCT (a_id, b_id)),
               count(*) FILTER (WHERE a_id >= b_id)
        FROM mh""").fetchone()
    print(f"[inv] dd_minhash pairs={n_pairs} dup_rows={n_dup} bad_order={bad_order}")
    assert n_dup == 0 and bad_order == 0, "V3 shape failed"

    # V1: exact Jaccard recompute restricted to docs appearing in pairs
    v1 = con.execute(f"""
        WITH ids AS (SELECT DISTINCT a_id AS id FROM mh
                     UNION SELECT DISTINCT b_id FROM mh),
        toks AS (
          SELECT d.doc_id,
                 list_filter(regexp_split_to_array(lower(d.text), '[^a-z0-9]+'),
                             x -> x <> '') AS tk
          FROM documents d JOIN ids ON ids.id = d.doc_id),
        sh AS (
          SELECT doc_id,
                 list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                for i in range(1, len(tk) - 1)]) AS shs
          FROM toks),
        j AS (
          SELECT m.a_id, m.b_id, m.jaccard,
                 CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE) /
                 (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs))) AS exact_j
          FROM mh m JOIN sh a ON a.doc_id = m.a_id JOIN sh b ON b.doc_id = m.b_id)
        SELECT count(*) FILTER (WHERE abs(jaccard - exact_j) > 1e-9 * greatest(1, abs(exact_j))),
               count(*) FILTER (WHERE exact_j < {THRESHOLD}),
               count(*)
        FROM j""").fetchone()
    print(f"[inv] V1 validity: value_mismatch={v1[0]} below_threshold={v1[1]} checked={v1[2]}")
    assert v1[0] == 0 and v1[1] == 0 and v1[2] == n_pairs, "V1 validity failed"

    # V2: identical-text pairs (>=3 tokens) must all be present
    v2 = con.execute("""
        WITH elig AS (
          SELECT doc_id, md5(text) AS h
          FROM documents
          WHERE len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) >= 3),
        dup AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM elig a JOIN elig b ON a.h = b.h AND a.doc_id < b.doc_id)
        SELECT count(*),
               count(*) FILTER (WHERE NOT EXISTS (
                 SELECT 1 FROM mh WHERE mh.a_id = dup.a_id AND mh.b_id = dup.b_id))
        FROM dup""").fetchone()
    print(f"[inv] V2 coverage: exact_dup_pairs={v2[0]} missing={v2[1]}")
    assert v2[1] == 0, "V2 coverage failed"

    print("[inv] dd_minhash sf1 invariants: ALL GREEN "
          f"(pairs={n_pairs}, validity-checked={v1[2]}, exact-dup-covered={v2[0]})")


if __name__ == "__main__":
    main()
