#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-vs-Spark correctness compare.

Usage: python3 /tmp/compare.py [sf_dir] [verify_out]
For each query in verify_out/oracle_sql.json: load the Spark result parquet
and the DuckDB oracle result, sort columns by name, sort rows, compare
row counts, dtypes (loosely), and a value hash.
"""
import duckdb, glob, json, os, sys
import pandas as pd
import hashlib

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")

sqls = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=sorted(df.columns)).reset_index(drop=True)
    return df

def vhash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()[:16]

n_pass = n_fail = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{d}/*.parquet")]) \
        if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in sqls:
        print(f"{name:28s} rows={len(spark_df):6d}  NO_ORACLE")
        continue
    try:
        ora_df = con.execute(sqls[name]).fetchdf()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        n_fail += 1
        continue
    s, o = canon(spark_df), canon(ora_df)
    rows = len(s) == len(o)
    schema = list(s.columns) == list(o.columns)
    # dtype check like the driver: compare value hash after normalization
    hs, ho = vhash(s), vhash(o)
    ok = rows and schema and hs == ho
    n_pass += ok
    n_fail += (not ok)
    status = "OK" if ok else f"FAIL rows={rows}({len(s)}/{len(o)}) schema={schema} hash={hs==ho}"
    print(f"{name:28s} {status}")
    if not ok and rows and schema:
        # show first differing row
        for i in range(min(len(s), len(o))):
            ts, to = tuple(s.iloc[i]), tuple(o.iloc[i])
            if repr(ts) != repr(to):
                print(f"   first diff row {i}:\n   spark : {ts}\n   oracle: {to}")
                break
        print(f"   spark dtypes : {dict(s.dtypes.astype(str))}")
        print(f"   oracle dtypes: {dict(o.dtypes.astype(str))}")
print(f"\n{n_pass} pass / {n_fail} fail")
