#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: for each parquet
result dumped by graft.Verify, run the matching oracle SQL in DuckDB over
the same testdata tables and compare (columns sorted by name, rows sorted,
values compared exactly with a small float tolerance fallback).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def approx_eq(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for qname, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, qname)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {qname}: no spark result"); n_bad += 1; continue
        tbl = pq.read_table(files[0])
        spark_cols = tbl.column_names
        spark_rows = [tuple(r) for r in zip(*[c.to_pylist() for c in tbl.columns])] if tbl.num_rows else []
        try:
            cur = con.execute(sql)
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {qname}: duckdb error: {e}"); n_bad += 1; continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {qname}: schema mismatch spark={sc} duck={dc}"); n_bad += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {qname}: rowcount spark={len(sr)} duck={len(dr)}"); n_bad += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if len(a) != len(b) or not all(approx_eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {qname}: row {bad[0]} spark={bad[1]} duck={bad[2]}"); n_bad += 1
        else:
            print(f"OK   {qname} ({len(sr)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
