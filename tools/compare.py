#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <verifyOutDir>/<name>/ parquet directory, runs the matching SQL
from oracle_sql.json in DuckDB over the raw parquet tables in <sfDir>,
sorts columns by name, canonicalizes values, and compares row multisets.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def rows_of(cols, table):
    names = sorted(cols)
    data = [table[c] for c in names]
    return sorted(tuple(canon(x) for x in row) for row in zip(*data))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISS  {name}: no parquet written"); n_fail += 1; continue
        spark_tbl = pq.read_table(files)
        spark_cols = {c: spark_tbl.column(c).to_pylist()
                      for c in spark_tbl.column_names}
        if name not in oracle:
            print(f"SKIP  {name}: rows={spark_tbl.num_rows} (no oracle)")
            continue
        try:
            res = con.execute(oracle[name])
            duck_cols_names = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"OERR  {name}: {e}"); n_fail += 1; continue
        duck_cols = {c: [r[i] for r in duck_rows]
                     for i, c in enumerate(duck_cols_names)}
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"SCHEMA {name}: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            n_fail += 1; continue
        a, b = rows_of(spark_cols, spark_cols), rows_of(duck_cols, duck_cols)
        if a == b:
            print(f"PASS  {name}: {len(a)} rows"); n_pass += 1
        else:
            print(f"FAIL  {name}: spark {len(a)} rows vs duck {len(b)} rows")
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"      first diff at row {i}:\n        spark={x}\n        duck ={y}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
