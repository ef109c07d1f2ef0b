#!/usr/bin/env python3
"""Local pre-verification mimicking the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB over <sf_dir>/*.parquet, and
compares: schema (column names), row count, and exact values after
sorting columns by name. Exit code 1 on any mismatch.
"""
import sys, json, glob, math

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows):
    out = []
    for row in rows:
        out.append(tuple(repr(v) for v in row))
    return out

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            failures.append((name, "no spark output"))
            continue
        spark_tbl = pq.read_table(files[0])
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            failures.append((name, f"schema mismatch: spark={s_cols} duck={d_cols}"))
            continue
        if spark_tbl.num_rows != duck.num_rows:
            failures.append((name, f"rowcount: spark={spark_tbl.num_rows} duck={duck.num_rows}"))
            continue
        s = spark_tbl.select(s_cols).to_pylist()
        dd = duck.select(s_cols).to_pylist()
        bad = 0
        for i, (a, b) in enumerate(zip(s, dd)):
            for c in s_cols:
                va, vb = a[c], b[c]
                if isinstance(va, float) and isinstance(vb, float):
                    if va != vb and not (math.isnan(va) and math.isnan(vb)):
                        bad += 1
                        if bad <= 3:
                            print(f"  [{name}] row {i} col {c}: spark={va!r} duck={vb!r}")
                elif va != vb:
                    bad += 1
                    if bad <= 3:
                        print(f"  [{name}] row {i} col {c}: spark={va!r} duck={vb!r}")
        if bad:
            failures.append((name, f"{bad} value mismatches"))
        else:
            print(f"OK   {name} ({spark_tbl.num_rows} rows)")
    # rows-only queries (no oracle)
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = p.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{p}*.parquet")
            n = pq.read_table(files[0]).num_rows if files else -1
            status = "OK*" if n > 0 else "FAIL"
            print(f"{status} {name} rows-only ({n} rows)")
            if n <= 0:
                failures.append((name, "rows-only: no rows"))
    if failures:
        print("\nFAILURES:")
        for n, m in failures:
            print(f"  {n}: {m}")
        sys.exit(1)
    print("\nall checks passed")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
