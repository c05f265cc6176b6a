#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: for each parquet
result dumped by graft.Verify, run the matching oracle SQL in DuckDB over
the same testdata tables and compare (columns sorted by name, rows sorted,
values compared EXACTLY — the driver hashes values, so any float fuzz or
array stringification here would report green for a driver-red query;
r5 shipped two such slips because this script was more tolerant than the
driver).

Driver parity rules enforced here:
 - exact value equality (no float tolerance; NaN==NaN allowed so a
   legitimately-NaN cell doesn't flap);
 - non-scalar (list/struct/map) result columns are a hard FAIL: the
   driver's pandas sort raises `unhashable type: numpy.ndarray` on them
   (CORRECTNESS_r05 `pipeline_tokenize`), so a query surface must render
   arrays to strings before it is driver-comparable;
 - dtype parity (r6's hash-red class): the driver's hash is dtype
   sensitive, so a DuckDB HUGEINT window sum that pandas renders as
   float64 against a Spark int64 column hash-mismatches even when every
   value compares equal (CORRECTNESS_r06 `events_sessionize`). We compare
   pandas-level dtype KINDS (int/float/bool/datetime/object) of the
   DuckDB `fetch_df()` result vs the Spark parquet read and FAIL on skew.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [nameRegex]
(nameRegex restricts the compare for local iteration against a filtered
graft.Verify run; the driver equivalent always runs the full suite.)
"""
import sys, json, glob, os, math, re
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def dtype_kind(dt):
    # numpy dtype -> coarse kind; the driver's hash conflates nothing
    # across these buckets, so any cross-bucket skew is a driver red.
    k = getattr(dt, "kind", "?")
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "M": "datetime", "O": "object"}.get(k, "other")

def dtype_skew(spark_df, duck_df, cols):
    """Columns whose pandas dtype kind differs between the Spark parquet
    (read the way the driver reads it) and the DuckDB fetch_df result."""
    bad = []
    for c in cols:
        ks = dtype_kind(spark_df.dtypes[c])
        kd = dtype_kind(duck_df.dtypes[c])
        if ks != kd:
            bad.append(f"{c}: spark={spark_df.dtypes[c]}({ks}) duck={duck_df.dtypes[c]}({kd})")
    return bad

def eq(a, b):
    # bools vs ints must not conflate (True == 1 in python); everything
    # else is exact equality with NaN==NaN.
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
        return True
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    name_re = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    n_ok = n_bad = 0
    for qname, sql in sorted(oracle.items()):
        if name_re and not name_re.search(qname):
            continue
        res_dir = os.path.join(out_dir, qname)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {qname}: no spark result"); n_bad += 1; continue
        tbl = pq.read_table(files[0])
        nested = [f.name for f in tbl.schema
                  if pa.types.is_nested(f.type)]
        if nested:
            print(f"FAIL {qname}: non-scalar result column(s) {nested} — the "
                  "driver's pandas sort crashes on these; render to string "
                  "(array_join) in the query surface")
            n_bad += 1; continue
        spark_cols = tbl.column_names
        spark_rows = [tuple(r) for r in zip(*[c.to_pylist() for c in tbl.columns])] if tbl.num_rows else []
        try:
            # ONE execution serves both the value compare (to_pylist gives
            # the same python natives fetchall did) and the dtype check
            # (to_pandas is what the driver-equivalent fetch_df does) —
            # the quadratic pair oracles dominate sf0.1 wall-clock and
            # must not run twice.
            atbl = con.execute(sql).fetch_arrow_table()
            duck_cols = atbl.column_names
            duck_rows = [tuple(r) for r in zip(*[c.to_pylist() for c in atbl.columns])] if atbl.num_rows else []
        except Exception as e:
            print(f"FAIL {qname}: duckdb error: {e}"); n_bad += 1; continue
        if duck_rows and any(isinstance(x, (list, tuple, dict)) for x in duck_rows[0]):
            print(f"FAIL {qname}: non-scalar oracle column — render to string "
                  "in the oracle SQL"); n_bad += 1; continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {qname}: schema mismatch spark={sc} duck={dc}"); n_bad += 1; continue
        try:
            skew = dtype_skew(tbl.to_pandas(), atbl.to_pandas(), sc)
        except Exception as e:
            print(f"FAIL {qname}: dtype check error: {e}"); n_bad += 1; continue
        if skew:
            print(f"FAIL {qname}: dtype skew {skew} — the driver hash is "
                  "dtype-sensitive; CAST the oracle column to the Spark type")
            n_bad += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {qname}: rowcount spark={len(sr)} duck={len(dr)}"); n_bad += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if len(a) != len(b) or not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {qname}: row {bad[0]} spark={bad[1]} duck={bad[2]}"); n_bad += 1
        else:
            print(f"OK   {qname} ({len(sr)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
