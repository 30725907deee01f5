#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries vs the DuckDB oracle.

Mimics the driver's correctness gate: runs graft.Verify at a given SF dir,
then executes each oracle_sql.json entry in DuckDB over the same parquet
tables and compares (rows, schema, values) against the Spark parquet output.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
(run graft.Verify first to populate <verifyOutDir>)
"""
import sys, os, json, glob, math
import duckdb


def values_equal(o, s):
    """Exact compare, except floats get a tolerance: last-ulp drift between
    Spark and DuckDB aggregation order must not false-FAIL (the driver's
    hash gate is exact, so treat near-misses as a loud warning, not noise).
    """
    if isinstance(o, float) and isinstance(s, float):
        if math.isnan(o) and math.isnan(s):
            return True
        return math.isclose(o, s, rel_tol=1e-9, abs_tol=1e-9)
    return o == s

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
        if len(set(ocols)) != len(ocols) or len(set(scols)) != len(scols):
            # duplicate (case-folded) names would make the permutation
            # compare one column twice and skip another — fail loudly,
            # duplicates also violate the oracle-parity contract.
            print(f"FAIL {name}: duplicate column names oracle={ocols} spark={scols}")
            ok = False
        elif sorted(ocols) != sorted(scols):
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
                if not all(values_equal(a, b) for a, b in zip(o, s)):
                    print(f"FAIL {name}: row {i} differs:\n  oracle={o}\n  spark ={s}")
                    ok = False
                    break
                if o != s:
                    print(f"WARN {name}: row {i} float drift (driver's exact "
                          f"hash may still fail):\n  oracle={o}\n  spark ={s}")
        if ok:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if not oracles:
        print("FAIL: oracle_sql.json is empty — zero coverage is a failure, "
              "not a pass (SparkEntry.oracleSql must be populated)")
        return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
