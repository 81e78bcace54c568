#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mirroring the driver's
compare: for each query dir under OUTDIR, run the oracle SQL in DuckDB
over views named after the sf-dir parquet tables, sort columns by name,
sort rows, compare values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
(dev-only tool; the engine itself never depends on it)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in sorted(glob.glob(f"{qdir}/*.parquet"))],
        ignore_index=True)
    if name not in oracle:
        print(f"{name}: NO-ORACLE rows={len(spark_df)}")
        continue
    duck_df = con.sql(oracle[name]).df()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64[ns, UTC]"):
                df[c] = df[c].dt.tz_localize(None)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    s, d = canon(spark_df), canon(duck_df)
    ok_schema = list(s.columns) == list(d.columns)
    ok_rows = len(s) == len(d)
    # dtype-faithful like the driver: a float64 sum vs int64 sum is a FAIL
    # even when values match (DuckDB sum->HUGEINT->float64 drift); report it
    # as DTYPE-MISMATCH so it's distinguishable from value divergence
    ok_vals = ok_schema and ok_rows and s.equals(d)
    dtype_only = False
    if not ok_vals and ok_schema and ok_rows:
        try:
            dtype_only = s.equals(d.astype(s.dtypes.to_dict()))
        except Exception:
            pass
    status = "OK" if ok_vals else ("DTYPE-MISMATCH" if dtype_only else "FAIL")
    if not ok_vals:
        fails += 1
        print(f"{name}: {status} schema={ok_schema} rows={len(s)}/{len(d)}")
        if dtype_only:
            mism = [f"{c}: {s[c].dtype} vs {d[c].dtype}"
                    for c in s.columns if s[c].dtype != d[c].dtype]
            print("  " + "; ".join(mism))
        elif ok_schema and ok_rows:
            neq = (s != d) & ~(s.isna() & d.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"  col {c} ({s[c].dtype} vs {d[c].dtype}): "
                      f"spark={s[c][i]!r} duck={d[c][i]!r} @row {i} "
                      f"({int(neq[c].sum())} diffs)")
        else:
            print(f"  spark cols: {list(s.columns)} dtypes={list(map(str, s.dtypes))}")
            print(f"  duck  cols: {list(d.columns)} dtypes={list(map(str, d.dtypes))}")
    else:
        print(f"{name}: OK rows={len(s)}")
sys.exit(1 if fails else 0)
