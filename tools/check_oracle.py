#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each query's Spark parquet output from <verifyOutDir>/<name>/ and the
oracle SQL from oracle_sql.json, runs the SQL in DuckDB over the fixture
tables, and compares (columns sorted by name, exact values, dtypes).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            mine = con.sql(f"SELECT * FROM '{files[0]}'").df()
            ref = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        mine = mine[sorted(mine.columns)]
        ref = ref[sorted(ref.columns)]
        problems = []
        if list(mine.columns) != list(ref.columns):
            problems.append(f"cols {list(mine.columns)} vs {list(ref.columns)}")
        elif len(mine) != len(ref):
            problems.append(f"rows {len(mine)} vs {len(ref)}")
        else:
            if [str(d) for d in mine.dtypes] != [str(d) for d in ref.dtypes]:
                problems.append(f"dtypes {list(map(str, mine.dtypes))} vs {list(map(str, ref.dtypes))}")
            neq = (mine.fillna("<NULL>") != ref.fillna("<NULL>"))
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                problems.append(f"{int(bad.sum())} differing rows; first at {i}:\n  spark: {mine.loc[i].to_dict()}\n  duck : {ref.loc[i].to_dict()}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems)); n_bad += 1
        else:
            print(f"OK   {name} ({len(mine)} rows)"); n_ok += 1
    missing = [q for q in ("x2_ml_score", "x3_ml_eval") if q not in oracle]
    print(f"\n{n_ok} ok, {n_bad} fail; rows-only (no oracle): {missing}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
