#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output) and runs the
corresponding SQL from <verifyOutDir>/oracle_sql.json in DuckDB against
the raw tables. Mirrors the driver's three checks per query:
  rows   — same row count
  schema — same column names AND DuckDB-reported column types
           (catches e.g. DuckDB HUGEINT sum() vs Spark BIGINT, which
           the driver's typed hash flags even when values are equal)
  hash   — bit-exact value equality after sorting columns by name and
           rows by value (the driver hashes typed values; any float
           difference, however small, is a hash mismatch)
A 1e-9-tolerant value compare is reported as diagnostic only ("near"),
never as a pass.
"""
import json
import math
import sys

import duckdb


def sort_key(v):
    # round floats so engine-side 1-ulp noise can't reorder rows and
    # defeat the tolerant value compare
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def canon(rows, cols, types):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return (sorted(cols), [str(types[i]) for i in idx],
            sorted(out, key=lambda t: tuple(sort_key(x) for x in t)))


def eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver testdata ships single files; ScaleGen dirs are
        # Spark-written directories of part files — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols, stypes, srows = canon(
                spark_rel.fetchall(), spark_rel.columns, spark_rel.types)
            duck_rel = con.sql(sql)
            dcols, dtypes, drows = canon(
                duck_rel.fetchall(), duck_rel.columns, duck_rel.types)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            n_fail += 1
            continue
        if stypes != dtypes:
            print(f"FAIL {name}: column types {stypes} vs {dtypes}"
                  " (driver's typed hash would mismatch)")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
            n_fail += 1
            continue
        bad = None
        exact = True
        for sr, dr in zip(srows, drows):
            for a, b in zip(sr, dr):
                if a != b:
                    exact = False
                    if not eq(a, b):
                        bad = (sr, dr)
                        break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: value mismatch\n  spark={bad[0]}\n  duck ={bad[1]}")
            n_fail += 1
        elif not exact:
            print(f"FAIL {name}: values near but not bit-exact"
                  " (driver hash would mismatch)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, exact)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
