#!/usr/bin/env python3
"""Replica-derivation gate for the sf1.0 sweep's three DuckDB-infeasible
oracles (q30 minhash, q52 char-ngram, q55 clusters).

The scaled dataset (tools/scale_up.py) is K key-shifted copies of sf0.1
with text copied VERBATIM, which makes the exact sf1.0 result derivable
from the (DuckDB-verified) sf0.1 result with no similarity recomputation:

  - All three metrics are text-determined, and candidate generation
    (minhash bands / byte shingles / simhash chunks) is a pure function
    of the text - so pair (a + i*OFF, b + j*OFF) is a candidate and
    passes the threshold iff (a, b) did at sf0.1, with the SAME metric
    value (same doubles through the same deterministic ops).
  - Replicas of one doc are byte-identical => jaccard exactly 1.0 and
    always candidates.
  - Expected pairs therefore = { normalized (a+i*OFF, b+j*OFF) for every
    sf0.1 pair (a,b), all i,j } UNION { (d+i*OFF, d+j*OFF), i<j } for
    every doc d. Counts: 256 pairs -> 100*256 + 45*5000 = 250,600,
    exactly what the engine produced.
  - Clusters: replica edges only connect copies of the same doc and
    cross edges mirror base edges, so components = base components x
    replicas; the min-id label of a merged cluster is the base cluster's
    label (copy 0), and a base singleton's replicas form their own
    cluster labeled by the base id.

Usage: python3 tools/derive_replicas.py <verify_sf0.1> <verify_sf1.0> <sf0.1_dir> [copies=10]
"""
import sys
import duckdb

OFF = 100_000_000


def check(con, name, expected_sql, got_glob):
    got = f"SELECT * FROM read_parquet('{got_glob}')"
    n_exp = con.execute(f"SELECT count(*) FROM ({expected_sql})").fetchone()[0]
    n_got = con.execute(f"SELECT count(*) FROM ({got})").fetchone()[0]
    miss = con.execute(
        f"SELECT count(*) FROM (({expected_sql}) EXCEPT ALL ({got}))").fetchone()[0]
    extra = con.execute(
        f"SELECT count(*) FROM (({got}) EXCEPT ALL ({expected_sql}))").fetchone()[0]
    ok = n_exp == n_got and miss == 0 and extra == 0
    print(f"{'PASS' if ok else 'FAIL'} {name}: expected={n_exp} got={n_got} "
          f"missing={miss} extra={extra}", flush=True)
    return ok


def main(v01, v10, sf01, copies=10):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({copies})) AS i")
    con.execute(f"CREATE VIEW docs AS SELECT doc_id "
                f"FROM read_parquet('{sf01}/documents.parquet')")
    all_ok = True
    for q in ["q30_neardup_minhash", "q52_neardup_ngram"]:
        base = f"read_parquet('{v01}/{q}/*.parquet')"
        expected = f"""
          SELECT least(d1 + ci.i * {OFF}, d2 + cj.i * {OFF}) AS d1,
                 greatest(d1 + ci.i * {OFF}, d2 + cj.i * {OFF}) AS d2,
                 jaccard
          FROM {base}, copies ci, copies cj
          UNION ALL
          SELECT doc_id + ci.i * {OFF}, doc_id + cj.i * {OFF}, 1.0
          FROM docs, copies ci, copies cj WHERE ci.i < cj.i
        """
        all_ok &= check(con, q, expected, f"{v10}/{q}/*.parquet")

    # q92 cross-split near-dup: the split predicate (doc_id % 7 = 0) is
    # NOT replica-invariant (OFF % 7 = 2, so each copy lands in a
    # different residue class) — derive from q30's FULL sf0.1 pair list
    # (same threshold/shingles/banding), emitting (eval, train) in both
    # directions, plus identity replica pairs that straddle the split.
    base30 = f"read_parquet('{v01}/q30_neardup_minhash/*.parquet')"
    expected92 = f"""
      SELECT d1 + ci.i * {OFF} AS eval_id, d2 + cj.i * {OFF} AS train_id, jaccard
      FROM {base30}, copies ci, copies cj
      WHERE (d1 + ci.i * {OFF}) % 7 = 0 AND (d2 + cj.i * {OFF}) % 7 <> 0
      UNION ALL
      SELECT d2 + ci.i * {OFF}, d1 + cj.i * {OFF}, jaccard
      FROM {base30}, copies ci, copies cj
      WHERE (d2 + ci.i * {OFF}) % 7 = 0 AND (d1 + cj.i * {OFF}) % 7 <> 0
      UNION ALL
      SELECT doc_id + ci.i * {OFF}, doc_id + cj.i * {OFF}, 1.0
      FROM docs, copies ci, copies cj
      WHERE ci.i <> cj.i AND (doc_id + ci.i * {OFF}) % 7 = 0
        AND (doc_id + cj.i * {OFF}) % 7 <> 0
    """
    all_ok &= check(con, "q92_fuzzy_decontamination", expected92,
                    f"{v10}/q92_fuzzy_decontamination/*.parquet")

    base55 = f"read_parquet('{v01}/q55_dup_clusters/*.parquet')"
    expected55 = f"""
      SELECT d.doc_id + c.i * {OFF} AS doc_id,
             coalesce(b.cluster_id, d.doc_id) AS cluster_id
      FROM docs d LEFT JOIN {base55} b USING (doc_id), copies c
    """
    all_ok &= check(con, "q55_dup_clusters", expected55,
                    f"{v10}/q55_dup_clusters/*.parquet")

    # q94 cluster-aware split: at sf1.0 EVERY doc is clustered (its 9
    # replicas are mutual exact dups), and the cluster representative is
    # always coalesce(base cluster label, base doc id) — the min member
    # id lands on copy 0. The draw (portable selector on the rep) is
    # therefore identical to the base doc's sf0.1 draw, replayed here
    # structurally from the base cluster table rather than assumed.
    expected94 = f"""
      SELECT dl.lang,
             CASE WHEN (coalesce(b.cluster_id, dl.doc_id) * 2654435761)
                  % 1000000007 * 1000 < 900 * CAST(1000000007 AS BIGINT)
                  THEN 'train' ELSE 'holdout' END AS split,
             count(*) AS n_docs
      FROM (SELECT doc_id, lang
            FROM read_parquet('{sf01}/documents.parquet')) dl
      LEFT JOIN {base55} b USING (doc_id), copies c
      GROUP BY 1, 2
    """
    all_ok &= check(con, "q94_cluster_split", expected94,
                    f"{v10}/q94_cluster_split/*.parquet")

    # q95 end-to-end corpus prep is replica-INVARIANT: replicas share
    # text verbatim and copy-0 ids sort below every shifted id, so
    # exact dedup keeps exactly the base survivors — the entire
    # downstream (pair graph, leak filter, closure, split draw) then
    # runs on identical rows and the sf1.0 result EQUALS the sf0.1
    # result verbatim.
    expected95 = f"SELECT * FROM read_parquet('{v01}/q95_corpus_prep/*.parquet')"
    all_ok &= check(con, "q95_corpus_prep", expected95,
                    f"{v10}/q95_corpus_prep/*.parquet")

    # q98 provenance matrix: every base pair appears copies^2 times
    # (any copy of d1 x any copy of d2), plus C(copies,2) identity
    # pairs per doc; replicas keep the base source, so the matrix is a
    # pure multiplicity rescale of the base pair graph.
    dsrc = f"read_parquet('{sf01}/documents.parquet')"
    expected98 = f"""
      SELECT src_a, src_b, CAST(SUM(cnt) AS BIGINT) AS n_pairs FROM (
        SELECT least(da.source, db.source) AS src_a,
               greatest(da.source, db.source) AS src_b,
               {copies * copies} AS cnt
        FROM {base30} p
        JOIN {dsrc} da ON p.d1 = da.doc_id
        JOIN {dsrc} db ON p.d2 = db.doc_id
        UNION ALL
        SELECT source, source, {copies * (copies - 1) // 2} FROM {dsrc})
      GROUP BY src_a, src_b
    """
    all_ok &= check(con, "q98_dup_provenance", expected98,
                    f"{v10}/q98_dup_provenance/*.parquet")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3],
                  int(sys.argv[4]) if len(sys.argv) > 4 else 10))
