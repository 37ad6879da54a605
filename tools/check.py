#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each dumped
query parquet in OUTDIR, run the matching oracle SQL (oracle_sql.json)
in DuckDB over the sf tables, then compare rows / schema / value hash
with columns sorted by name. Usage: check.py SFDIR OUTDIR [query...]"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import hashlib

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
# Optional resource caps for big-SF sweeps (unset = DuckDB defaults):
# DUCK_TEMP_DIR / DUCK_MAX_TEMP / DUCK_MEM / DUCK_THREADS.
for k in ("temp_directory", "max_temp_directory_size", "memory_limit",
          "threads"):
    v = os.environ.get("DUCK_" + {"temp_directory": "TEMP_DIR",
                                  "max_temp_directory_size": "MAX_TEMP",
                                  "memory_limit": "MEM",
                                  "threads": "THREADS"}[k])
    if v:
        con.execute(f"SET {k}='{v}'")
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # normalize float display; stringify everything row-wise
    def cell(v):
        if isinstance(v, float):
            return repr(round(v, 6))
        return str(v)
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]
    return rows

fails = 0
for name in sorted(oracle):
    if only and name not in only: continue
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"{name:22s} NO SPARK OUTPUT"); fails += 1; continue
    sdf = pq.read_table(spark_files).to_pandas()
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:22s} ORACLE ERR {e}"); fails += 1; continue
    ok_rows = len(sdf) == len(odf)
    ok_schema = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
    ok_hash = False
    if ok_rows and ok_schema:
        odf.columns = [c for c in odf.columns]
        s, o = canon(sdf), canon(odf)
        ok_hash = s == o
        if not ok_hash:
            # show first diff
            for i, (a, b) in enumerate(zip(s, o)):
                if a != b:
                    print(f"  first diff at row {i}:\n   spark : {a}\n   oracle: {b}")
                    break
    status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
    if status == "FAIL": fails += 1
    print(f"{name:22s} {status}  rows={len(sdf)}/{len(odf)} schema={ok_schema} hash={ok_hash}")
    if not ok_schema:
        print(f"   spark cols : {sorted(sdf.columns)}\n   oracle cols: {sorted(odf.columns)}")
sys.exit(1 if fails else 0)
