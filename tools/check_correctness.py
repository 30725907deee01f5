#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries vs the DuckDB oracle.

Mimics the driver's correctness gate: runs graft.Verify at a given SF dir,
then executes each oracle_sql.json entry in DuckDB over the same parquet
tables and compares (rows, schema, values) against the Spark parquet output.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
(run graft.Verify first to populate <verifyOutDir>)
"""
import sys, os, json, glob, math, time, threading
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

# Oracle-vs-Spark type pairs that the driver's exact hash is known to
# tolerate (same wire representation after its normalization). Anything
# else — notably DuckDB HUGEINT vs Spark BIGINT from an uncast
# SUM(CASE...) — must fail HERE, before the driver's hash does (r7's
# q69 red was exactly that class).
TYPE_EQUIV = {
    # Spark writes TimestampType as parquet isAdjustedToUTC=true, which
    # DuckDB reads back as TIMESTAMP WITH TIME ZONE; oracle-side window
    # arithmetic yields plain TIMESTAMP. Same instant, same hash.
    ("timestamp", "timestamp with time zone"),
}


def types_identical(name, ocols, otypes, scols, stypes):
    """Column-by-column (name-matched) oracle/Spark type identity."""
    omap = dict(zip(ocols, otypes))
    smap = dict(zip(scols, stypes))
    ok = True
    for c in sorted(ocols):
        o, s = omap[c].lower(), smap[c].lower()
        if o != s and (o, s) not in TYPE_EQUIV and (s, o) not in TYPE_EQUIV:
            print(f"FAIL {name}: column '{c}' type mismatch oracle={o} "
                  f"spark={s} (the driver's hash is representation-exact; "
                  f"CAST the oracle side)")
            ok = False
    return ok


def main(sf_dir, out_dir, threads=None, timeout=None, skip=(), only=None):
    """threads/timeout/skip/only are sweep extras (large-SF runs): cap
    each oracle's wall time via duckdb interrupt, skip known-infeasible
    oracles (they get a different gate, e.g. replica derivation), or
    check only the named queries (single-query fix reruns)."""
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if only is not None and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name} (excluded)", flush=True)
            n_skip += 1
            continue
        t_start = time.time()
        timer = threading.Timer(timeout, con.interrupt) if timeout else None
        if timer:
            timer.start()
        sql = oracles[name]
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output at {spark_glob}", flush=True)
            if timer:
                timer.cancel()
            n_fail += 1
            continue
        try:
            oracle = con.sql(sql)
            ocols = [c.lower() for c in oracle.columns]
            otypes = [str(t) for t in oracle.types]
            orows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error after {time.time()-t_start:.1f}s: {e}", flush=True)
            if timer:
                timer.cancel()
            n_fail += 1
            continue
        try:
            spark = con.sql(f"SELECT * FROM read_parquet('{spark_glob}')")
            scols = [c.lower() for c in spark.columns]
            stypes = [str(t) for t in spark.types]
            srows = spark.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}", flush=True)
            if timer:
                timer.cancel()
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
        elif not types_identical(name, ocols, otypes, scols, stypes):
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
        if timer:
            timer.cancel()
        if ok:
            print(f"PASS {name} ({len(orows)} rows, {time.time()-t_start:.1f}s)", flush=True)
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_skip} skip")
    if not oracles:
        print("FAIL: oracle_sql.json is empty — zero coverage is a failure, "
              "not a pass (SparkEntry.oracleSql must be populated)")
        return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    only = set(opts["only"].split(",")) if "only" in opts else None
    sys.exit(main(args[0], args[1],
                  threads=int(opts.get("threads", 0)) or None,
                  timeout=float(opts.get("timeout", 0)) or None,
                  skip=set(opts.get("skip", "").split(",")) - {""},
                  only=only))
