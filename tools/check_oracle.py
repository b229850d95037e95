#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare (columns sorted by name, values
hashed row-wise). Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import json, sys, math

import duckdb

sf_dir, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

fails = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
        d_rel = con.sql(sql)
        d_cols, d_rows = d_rel.columns, d_rel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        fails += 1
        continue
    a, b = canon(s_rows, s_cols), canon(d_rows, d_cols)
    if a != b:
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  first diff at row {i}:\n    spark={x}\n    duck ={y}")
                break
        if len(a) != len(b) and a and b:
            print(f"    spark[0]={a[0]}\n    duck [0]={b[0]}")
        fails += 1
    else:
        print(f"OK   {name} ({len(a)} rows)")
print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
