#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads outDir/<name>/ parquet (Spark results) + outDir/oracle_sql.json,
runs each oracle against DuckDB views over sfDir's tables, and compares
values column-sorted-by-name, row-sorted.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"  {name}: MISSING spark output"); fails.append(name); continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"  {name}: ERROR {e}"); fails.append(name); continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        print(f"  {name}: SCHEMA cols {list(sdf.columns)} vs {list(odf.columns)}")
        fails.append(name); continue
    if len(sdf) != len(odf):
        print(f"  {name}: ROWS {len(sdf)} vs {len(odf)}"); fails.append(name); continue
    s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    o = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    try:
        o = o.astype(s.dtypes.to_dict())
    except Exception as e:
        print(f"  {name}: DTYPE {s.dtypes.to_dict()} vs {o.dtypes.to_dict()} ({e})")
        fails.append(name); continue
    eq = s.equals(o)
    if not eq:
        diff = (s != o) & ~(s.isna() & o.isna())
        ndiff = int(diff.any(axis=1).sum())
        print(f"  {name}: VALUES {ndiff}/{len(s)} rows differ")
        bad = diff.any(axis=1)
        print(pd.concat([s[bad].head(3).add_suffix('_spark'),
                         o[bad].head(3).add_suffix('_oracle')], axis=1).to_string())
        fails.append(name); continue
    print(f"  {name}: OK ({len(s)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
