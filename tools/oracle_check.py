#!/usr/bin/env python3
"""Self-check harness mirroring the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <verifyOutDir>
For each query parquet in verifyOutDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables registered from sfDir parquet), sorts
columns by name and rows, and compares values cell-by-cell.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v!r}"
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing {e}")
            n_bad += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_bad += 1
            continue
        ev = sorted(tuple(norm(v) for v in r) for r in exp.itertuples(index=False))
        gv = sorted(tuple(norm(v) for v in r) for r in got.itertuples(index=False))
        if len(ev) != len(gv):
            print(f"FAIL {name}: rows {len(gv)} != {len(ev)}")
            n_bad += 1
            continue
        diff = [i for i, (a, b) in enumerate(zip(ev, gv)) if a != b]
        if diff:
            i = diff[0]
            print(f"FAIL {name}: {len(diff)} differing rows; first at {i}:")
            print(f"  oracle: {ev[i]}")
            print(f"  spark : {gv[i]}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(ev)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
