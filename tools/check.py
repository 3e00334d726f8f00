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
    # Dtype gate (mirrors the driver's value-hash strictness): a dtype
    # mismatch is a FAILURE unless it is a benign same-kind widening
    # (int32 vs int64, float32 vs float64) — those we upcast and compare.
    # A float-vs-int gap (e.g. DuckDB HUGEINT -> pandas float64 vs Spark
    # int64) must fail locally, because the driver's hash fails on it.
    dtype_bad = []
    for c in s.columns:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        if s[c].dtype == o[c].dtype:
            continue
        # The upcasts can still raise on same-kind-but-incompatible pairs
        # (tz-aware vs naive datetime64 are both kind 'M'); route that to
        # a per-query DTYPE failure instead of killing the whole sweep.
        try:
            if sk in "iu" and ok in "iu":
                s[c] = s[c].astype("int64"); o[c] = o[c].astype("int64")
            elif sk == "f" and ok == "f":
                s[c] = s[c].astype("float64"); o[c] = o[c].astype("float64")
            elif sk == "M" and ok == "M":
                s[c] = s[c].astype("datetime64[us]")
                o[c] = o[c].astype("datetime64[us]")
            else:
                dtype_bad.append((c, str(s[c].dtype), str(o[c].dtype)))
        except (TypeError, ValueError) as e:
            dtype_bad.append((c, str(s[c].dtype), str(o[c].dtype), str(e)))
    if dtype_bad:
        print(f"  {name}: DTYPE {dtype_bad} (spark vs oracle)")
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
