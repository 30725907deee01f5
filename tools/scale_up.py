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


def main(src, out, copies=10):
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
                parts.append(t)
            scaled = pa.concat_tables(parts)
        # version 2.6 keeps TIMESTAMP(NANOS) as-is (no us coercion); strip
        # the pandas metadata blob - neither engine reads it
        pq.write_table(scaled.replace_schema_metadata(None),
                       f"{out}/{table}.parquet", version="2.6")
        print(f"[scaleup] {table}: {scaled.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
