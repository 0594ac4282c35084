#!/usr/bin/env python3
"""Dev-only mirror of the driver's t2 DuckDB-oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB against the sfDir tables,
and compares row count, column names, and values (columns sorted by
name, rows sorted, floats compared to 1e-9 rel tolerance and also
exact-hash)."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns ints, categories to str
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(d + "/*.parquet"))],
            ignore_index=True) if glob.glob(d + "/*.parquet") else pd.DataFrame()
        if name not in oracle:
            print(f"SKIP  {name}: rows={len(spark_df)} (no oracle; rows-only)")
            n_skip += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} != {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
            continue
        ok = True
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                av = av.astype(float); bv = bv.astype(float)
                both_nan = av.isna() & bv.isna()
                close = np.isclose(av.fillna(0), bv.fillna(0), rtol=1e-9, atol=1e-12)
                exact = (av.values == bv.values)
                bad = ~(both_nan | (close & (av.isna() == bv.isna())))
                nonexact = (~(both_nan | exact)).sum()
                if bad.any():
                    i = bad.idxmax()
                    print(f"FAIL  {name}: col {c} row {i}: {av[i]!r} != {bv[i]!r}")
                    ok = False
                    break
                if nonexact:
                    print(f"WARN  {name}: col {c}: {nonexact} rows differ in last ulp (close but not bit-equal)")
            else:
                if not av.astype(str).equals(bv.astype(str)):
                    diff = av.astype(str) != bv.astype(str)
                    i = diff.idxmax()
                    print(f"FAIL  {name}: col {c} row {i}: {av[i]!r} != {bv[i]!r}")
                    ok = False
                    break
        if ok:
            print(f"PASS  {name}: {len(a)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
