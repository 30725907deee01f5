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


def _mutate_text(text, doc_id, copy):
    """Portable-hash token mutation for copy > 0: ~30% of token
    positions (deterministic in (doc_id, position, copy)) swap to a
    copy-specific synthetic token. 3-shingle survival across copies is
    ~0.7^3 = 0.34, so cross-copy Jaccard ~ 0.34/1.66 = 0.21 — far
    below every gate threshold (0.6/0.8): copies are NOT near-dups of
    each other, and pair-emitting operators see ~linear growth (each
    copy replicates the base corpus's internal pairs only)."""
    if text is None:
        return None
    toks = text.split(" ")
    out = []
    for j, t in enumerate(toks):
        h = ((doc_id * 31 + j) * M1 + copy * 40503) % P1
        out.append(f"z{h % 9973}" if h % 10 < 3 else t)
    return " ".join(out)


def _mutate_embedding(vec, vec_id, copy):
    """Deterministic per-component noise at ~1.5x the vector's own RMS:
    cross-copy cosine drops to ~0.75 (below the near-dup gates), while
    each copy keeps the base corpus's internal similarity structure."""
    if vec is None:
        return None
    d = len(vec)
    if d == 0:
        return vec
    rms = (sum(x * x for x in vec) / d) ** 0.5 or 1.0
    amp = 1.5 * rms
    return [
        x + amp * ((((vec_id * 31 + j) * M1 + copy * 40503) % P1 % 2001)
                   - 1000) / 1000.0
        for j, x in enumerate(vec)
    ]


def _perturb(table, t, copy):
    """Content-perturb copy > 0 of documents/embeddings (other tables
    keep verbatim payloads — their operators join on keys, not
    content). n_chars re-derives from the mutated text so the length
    column stays truthful."""
    if copy == 0:
        return t
    if table == "documents":
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        mutated = [_mutate_text(x, i - copy * OFFSET, copy)
                   for i, x in zip(ids, texts)]
        ti = t.schema.get_field_index("text")
        t = t.set_column(ti, t.schema.field("text"),
                         pa.array(mutated, type=t.schema.field("text").type))
        if "n_chars" in t.schema.names:
            ni = t.schema.get_field_index("n_chars")
            lens = [None if x is None else len(x) for x in mutated]
            t = t.set_column(ni, t.schema.field("n_chars"),
                             pa.array(lens, type=t.schema.field("n_chars").type))
    elif table == "embeddings":
        ids = t.column("vec_id").to_pylist()
        vecs = t.column("embedding").to_pylist()
        mutated = [_mutate_embedding(v, i - copy * OFFSET, copy)
                   for i, v in zip(ids, vecs)]
        ei = t.schema.get_field_index("embedding")
        t = t.set_column(ei, t.schema.field("embedding"),
                         pa.array(mutated, type=t.schema.field("embedding").type))
    return t


def main(src, out, copies=10, perturb=False):
    os.makedirs(out, exist_ok=True)
    for table, keys in SHIFT.items():
        base = pq.read_table(f"{src}/{table}.parquet")
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
    # Usage: scale_up.py <srcSfDir> <outDir> [copies=10] [perturb]
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10,
         perturb=(len(sys.argv) > 4 and sys.argv[4] == "perturb"))
