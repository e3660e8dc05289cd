#!/usr/bin/env python3
"""Local correctness loop mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name>/ parquet result, runs oracle_sql.json[name] in
DuckDB against the sf parquet tables, and compares (columns sorted by name,
rows sorted, values hashed with float rounding).
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string repr with float rounding
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == 'f':
            out[c] = col.map(lambda v: 'NaN' if v is None or (isinstance(v,float) and math.isnan(v)) else repr(float(v)))
        elif str(col.dtype).startswith('datetime'):
            out[c] = col.astype('datetime64[us]').astype(str)
        else:
            out[c] = col.map(lambda v: str(v))
    out = out.sort_values(by=list(out.columns), kind='mergesort').reset_index(drop=True)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            spark_df = pd.read_parquet(res_dir)
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for i in idx:
                print(f"  spark: {a.loc[i].to_dict()}")
                print(f"  duck : {b.loc[i].to_dict()}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    # queries without oracle → rows-only note
    for name in os.listdir(out_dir):
        if os.path.isdir(f"{out_dir}/{name}") and name not in oracle:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
