#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry
query dumped by graft.Verify, run the oracle SQL in DuckDB over the same
sf-dir parquet tables and compare (columns sorted by name, rows sorted,
values hashed). Usage: oracle_check.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, bools -> bool
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]): df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]): df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"{name}: NO OUTPUT"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"{name}: rows-only ({len(spark_df)} rows)"); n_skip += 1
            if len(spark_df) == 0: print(f"  WARNING: zero rows")
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{name}: COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"{name}: ROWCOUNT spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        if a.equals(b):
            print(f"{name}: OK ({len(a)} rows)"); n_pass += 1
        else:
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"{name}: VALUE MISMATCH in {bad.sum()}/{len(a)} rows")
            cols = neq.any(axis=0)
            print("  differing cols:", list(a.columns[cols]))
            idx = a.index[bad][:3]
            for i in idx:
                print("   spark:", a.loc[i].to_dict())
                print("   duck :", b.loc[i].to_dict())
            n_fail += 1
    print(f"\nPASS={n_pass} FAIL={n_fail} ROWS_ONLY={n_skip}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
