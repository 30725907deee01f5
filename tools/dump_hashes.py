#!/usr/bin/env python3
"""Per-query (rows, value hash) of a graft.Verify dump dir.

The engine-side stability reference a large-SF sweep records so the
NEXT round can diff the same queries at the same SF without re-deriving
oracles (DuckDB cannot recompute several of them at sf1.0). The hash is
order-independent (bit_xor of per-row hashes over name-sorted columns),
so nondeterministic output order never false-flags; a value change or
row-count change does.

Usage: python3 tools/dump_hashes.py <verifyOutDir>
Prints: <query>\t<rows>\t<hash>
"""
import sys, os, glob
import duckdb


def main(out_dir):
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if not os.path.isdir(p):
            continue
        files = glob.glob(os.path.join(p, "*.parquet"))
        if not files:
            print(f"{d}\tNO_PARQUET\t-")
            continue
        con = duckdb.connect()
        cols = sorted(con.sql(
            f"SELECT * FROM read_parquet({files!r}) LIMIT 0").columns)
        sel = ", ".join(f'"{c}"' for c in cols)
        n, h = con.sql(
            f"SELECT COUNT(*), COALESCE(bit_xor(hash(ROW({sel}))), 0) "
            f"FROM read_parquet({files!r})").fetchone()
        print(f"{d}\t{n}\t{h:016x}")
        con.close()


if __name__ == "__main__":
    main(sys.argv[1])
