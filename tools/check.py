#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB over views of the sfDir parquet
tables, loads the Spark-written parquet for the same key, sorts columns
by name on both sides, and compares cell-by-cell (exact; floats bitwise).
Strictest interpretation: row order must match too (every query ends in
ORDER BY a unique/total column set, so this is fair).
"""
import sys, json, math, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    out = []
    for col in df.columns:
        s = df[col]
        vals = []
        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, (np.floating, float)):
                vals.append(repr(float(v)))
            elif isinstance(v, (np.integer, int)):
                vals.append(str(int(v)))
            elif isinstance(v, (pd.Timestamp,)):
                # DATE columns surface as midnight Timestamps from duckdb
                # but datetime.date objects from pandas-read parquet;
                # normalize midnight to the date form so both agree
                if v.tzinfo is None and v == v.normalize():
                    vals.append(v.date().isoformat())
                else:
                    vals.append(v.isoformat())
            elif isinstance(v, np.ndarray):
                vals.append(str(list(v)))
            elif v is pd.NaT:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(vals)
    return list(df.columns), out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        try:
            # pandas/pyarrow, NOT duckdb: the driver loads the Spark side
            # this way, and the dtype classes differ (decimal128 ->
            # decimal.Decimal objects, list -> ndarray). Round 1 shipped a
            # query that passed a duckdb-read replica but failed the real
            # gate on exactly that gap.
            import glob as _glob
            got = pd.concat([pd.read_parquet(f)
                             for f in sorted(_glob.glob(f"{spark_path}/*.parquet"))],
                            ignore_index=True)
            # driver-style: row-sort by all columns after column sort —
            # list/ndarray cells make this raise, as on the driver
            got = got[sorted(got.columns)].sort_values(by=sorted(got.columns),
                                                       kind="mergesort").reset_index(drop=True)
            exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns),
                                                       kind="mergesort").reset_index(drop=True)
        except Exception as e:
            print(f"FAIL {name}: spark-side load/sort (driver-style) error: {e}")
            n_fail += 1; continue
        gc, gv = canon(got)
        ec, ev = canon(exp)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows differ spark={len(got)} oracle={len(exp)}"); n_fail += 1; continue
        bad = None
        for ci, colname in enumerate(gc):
            for ri in range(len(gv[ci])):
                if gv[ci][ri] != ev[ci][ri]:
                    bad = (colname, ri, gv[ci][ri], ev[ci][ri]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(gc)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
