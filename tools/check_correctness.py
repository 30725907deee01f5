#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries vs the DuckDB oracle.

Mimics the driver's correctness gate: runs graft.Verify at a given SF dir,
then executes each oracle_sql.json entry in DuckDB over the same parquet
tables and compares (rows, schema, values) against the Spark parquet output.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
(run graft.Verify first to populate <verifyOutDir>)
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}")
            n_fail += 1
            continue
        try:
            oracle = con.sql(sql)
            ocols = [c.lower() for c in oracle.columns]
            orows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            spark = con.sql(f"SELECT * FROM read_parquet('{spark_glob}')")
            scols = [c.lower() for c in spark.columns]
            srows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue

        ok = True
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: schema mismatch oracle={sorted(ocols)} spark={sorted(scols)}")
            ok = False
        elif len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            ok = False
        else:
            # column-name-sorted value compare, row order as returned
            operm = [ocols.index(c) for c in sorted(ocols)]
            sperm = [scols.index(c) for c in sorted(scols)]
            for i, (orow, srow) in enumerate(zip(orows, srows)):
                o = [orow[p] for p in operm]
                s = [srow[p] for p in sperm]
                if o != s:
                    print(f"FAIL {name}: row {i} differs:\n  oracle={o}\n  spark ={s}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
