#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: load each dumped
query parquet from Verify, run its oracle SQL in DuckDB against the same
sf tables, and compare row count, schema (sorted column names) and values.
Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if v is None:
        return "NULL"
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
            exp_rel = con.sql(sql)
            exp = exp_rel.fetchall()
            exp_cols = [d[0] for d in exp_rel.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failed.append(name)
            continue
        ok = True
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns got={sorted(got_cols)} exp={sorted(exp_cols)}")
            ok = False
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            ok = False
        if ok:
            gperm = [got_cols.index(c) for c in sorted(got_cols)]
            eperm = [exp_cols.index(c) for c in sorted(exp_cols)]
            for i, (g, e) in enumerate(zip(got, exp)):
                gr = [canon(g[p]) for p in gperm]
                er = [canon(e[p]) for p in eperm]
                if gr != er:
                    print(f"FAIL {name}: row {i} differs\n  got={gr}\n  exp={er}")
                    ok = False
                    break
        print(("PASS " if ok else "FAIL ") + name + f" ({len(got)} rows)")
        if not ok:
            failed.append(name)
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
