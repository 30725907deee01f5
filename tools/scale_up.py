#!/usr/bin/env python3
"""Dev tool: materialize an sf1.0-class dataset for the one-off large-scale
sweep (VERDICT r6 task 2) by replicating the driver's sf0.1 tables KF x with
key-shifting. Driver-side tooling (pyarrow), NOT part of the library:
pyarrow round-trips the driver's exact parquet types (notably events.ts
TIMESTAMP(NANOS), which neither Spark nor this box's duckdb can write
back), so the scaled dir is type-identical to the driver's layout and both
engines read the same bytes.

Scale-up semantics:
  - Entity key domains (custkey, orderkey, partkey, suppkey, event_id,
    user_id, doc_id/vec_id) shift by copy*OFFSET: every copy is
    referentially self-contained, so joins grow linearly (duplicated keys
    would grow join output quadratically in the copy count).
  - documents.doc_id and embeddings.vec_id shift by the SAME offset: they
    share a key domain (Queries q28 joins doc_id === vec_id).
  - nation/region stay fixed (TPC-H semantics: dims constant across SF);
    c_nationkey / s_nationkey / n_regionkey are NOT shifted.
  - Payloads (text, embedding, props, ts, prices) copy verbatim. Documents/
    embeddings therefore hold KF exact replicas of each body/vector under
    distinct ids - deliberately: it stress-tests the dedup family (every
    doc gains KF-1 exact duplicates) and forces ANN/top-k through massive
    score ties that only a deterministic id tie-break survives.

Usage: python3 tools/scale_up.py <srcSfDir> <outDir> [copies=10]
"""
import sys, os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 100_000_000  # > any base key; copies cannot collide

SHIFT = {
    "customer":   ["c_custkey"],
    "orders":     ["o_orderkey", "o_custkey"],
    "lineitem":   ["l_orderkey", "l_partkey", "l_suppkey"],
    "part":       ["p_partkey"],
    "supplier":   ["s_suppkey"],
    "events":     ["event_id", "user_id"],
    "documents":  ["doc_id"],
    "embeddings": ["vec_id"],
    "nation":     [],   # fixed dims: copied once, never replicated
    "region":     [],
}


M1 = 2654435761
P1 = 1000000007


def _tok_hash(t):
    h = 0
    for ch in t:
        h = (h * 31 + ord(ch)) % 2147483647
    return h


def _mutate_text(text, copy, cache):
    """Per-copy VOCABULARY substitution for copy > 0: ~30% of the
    vocabulary (deterministic in (token, copy)) relabels to a
    copy-specific synthetic token. A consistent relabeling is an
    (almost-)injection on shingle space, so WITHIN-copy pairwise
    similarity — Jaccard, containment, simhash, n-gram — is preserved
    essentially exactly and each copy replicates the base corpus's
    internal pair structure (~linear pair growth). ACROSS copies a
    token survives in both only when unmutated in both (0.7^2 = 0.49),
    so 3-shingle survival is ~0.49^3 = 0.12 and cross-copy Jaccard
    ~0.12/1.88 = 0.06 — far below every gate threshold. (The first
    cut mutated per (doc, position): that broke within-copy pairs too,
    and counts grew SUB-linearly — the wrong failure.)"""
    if text is None:
        return None
    out = []
    for t in text.split(" "):
        r = cache.get(t)
        if r is None:
            h = (_tok_hash(t) * 31 + copy * 40503) % P1
            r = f"z{h % 9973}" if h % 10 < 3 else t
            cache[t] = r
        out.append(r)
    return " ".join(out)


def _signed_perm(d, copy):
    """Copy-specific signed coordinate permutation (an orthogonal map):
    coordinates reorder by a hash-keyed argsort, signs flip by hash
    parity. Exactly preserves every within-copy dot/cosine/distance;
    the same vector under two different copies' maps lands at
    |cos| ~ 1/sqrt(d) — below the 0.3 gate for d = 64."""
    keys = [(((j + 1) * M1 + copy * 40503) % P1, j) for j in range(d)]
    perm = [j for _, j in sorted(keys)]
    signs = [1 if (((j + 7) * 40503 + copy * M1) % P1) % 2 == 0 else -1
             for j in range(d)]
    return perm, signs


def _mutate_embedding(vec, copy, perm_cache):
    if vec is None:
        return None
    d = len(vec)
    if d == 0:
        return vec
    ps = perm_cache.get(d)
    if ps is None:
        ps = _signed_perm(d, copy)
        perm_cache[d] = ps
    perm, signs = ps
    return [signs[j] * vec[perm[j]] for j in range(d)]


def _perturb(table, t, copy):
    """Content-perturb copy > 0 of documents/embeddings (other tables
    keep verbatim payloads — their operators join on keys, not
    content). n_chars re-derives from the mutated text so the length
    column stays truthful."""
    if copy == 0:
        return t
    if table == "documents":
        texts = t.column("text").to_pylist()
        vocab = {}
        mutated = [_mutate_text(x, copy, vocab) for x in texts]
        ti = t.schema.get_field_index("text")
        t = t.set_column(ti, t.schema.field("text"),
                         pa.array(mutated, type=t.schema.field("text").type))
        if "n_chars" in t.schema.names:
            ni = t.schema.get_field_index("n_chars")
            lens = [None if x is None else len(x) for x in mutated]
            t = t.set_column(ni, t.schema.field("n_chars"),
                             pa.array(lens, type=t.schema.field("n_chars").type))
    elif table == "embeddings":
        vecs = t.column("embedding").to_pylist()
        perms = {}
        mutated = [_mutate_embedding(v, copy, perms) for v in vecs]
        ei = t.schema.get_field_index("embedding")
        t = t.set_column(ei, t.schema.field("embedding"),
                         pa.array(mutated, type=t.schema.field("embedding").type))
    return t


def _timeshift(table, t, copy, span):
    """Shift copy > 0 of events by copy*(span + 1h): a 10x corpus that
    covers 10x WALL TIME instead of 10x density on one shared axis.
    The clone replica multiplies concurrency (every time bucket gets
    10x the users => overlap-pair families grow ~quadratically BY
    SEMANTICS); this mode models organic corpus growth, where copies
    occupy disjoint time windows and interval/session operators should
    scale ~linearly. Only events shifts - other tables carry no time
    axis the overlap family reads."""
    if copy == 0 or table != "events":
        return t
    ti = t.schema.get_field_index("ts")
    fld = t.schema.field("ts")
    gap_ns = 3_600_000_000_000  # 1h guard so sessions cannot straddle copies
    delta = pa.scalar(copy * (span + gap_ns), type=pa.int64())
    shifted = pc.add(t.column("ts").cast(pa.int64()), delta).cast(fld.type)
    return t.set_column(ti, fld, shifted)


def main(src, out, copies=10, perturb=False, timeshift=False):
    os.makedirs(out, exist_ok=True)
    for table, keys in SHIFT.items():
        base = pq.read_table(f"{src}/{table}.parquet")
        span = None
        if timeshift and table == "events":
            ts64 = base.column("ts").cast(pa.int64())
            span = (pc.max(ts64).as_py() - pc.min(ts64).as_py())
        if not keys:
            scaled = base
        else:
            parts = []
            for i in range(copies):
                t = base
                for k in keys:
                    idx = t.schema.get_field_index(k)
                    shifted = pc.add(t.column(k), pa.scalar(
                        i * OFFSET, type=t.schema.field(k).type))
                    t = t.set_column(idx, t.schema.field(k), shifted)
                if perturb:
                    t = _perturb(table, t, i)
                if timeshift:
                    t = _timeshift(table, t, i, span)
                parts.append(t)
            scaled = pa.concat_tables(parts)
        # version 2.6 keeps TIMESTAMP(NANOS) as-is (no us coercion); strip
        # the pandas metadata blob - neither engine reads it
        pq.write_table(scaled.replace_schema_metadata(None),
                       f"{out}/{table}.parquet", version="2.6")
        print(f"[scaleup] {table}: {scaled.num_rows} rows"
              + (" (perturbed)" if perturb and keys and
                 table in ("documents", "embeddings") else ""))


if __name__ == "__main__":
    # Usage: scale_up.py <srcSfDir> <outDir> [copies=10] [perturb|timeshift]
    mode = sys.argv[4] if len(sys.argv) > 4 else ""
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10,
         perturb=(mode == "perturb"), timeshift=(mode == "timeshift"))
