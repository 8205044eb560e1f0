#!/usr/bin/env python3
#
# NOTE (round 2): this checker is value-TOLERANT (math.isclose) and exists
# for quick triage only. The gate the docs and the driver use is
# tools/hash_check.py — the strict canonicalization mimic. Do not publish
# "exact" claims from this script (VERDICT r1, "What's wrong" #1).
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

Reads outDir/oracle_sql.json, runs each SQL in DuckDB over views on the
sf dir's parquet tables, loads the Spark result parquet from
outDir/<name>/, sorts columns by name and rows by all columns, and
compares values (NaN-aware, decimal/float tolerant-exact).
"""
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "tolist"):  # numpy scalar or array
        return norm_cell(v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def load_frame(tbl):
    df = tbl.to_pandas()
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return list(df.columns), [str(t) for t in df.dtypes], rows


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cmp_cell(x, y) for x, y in zip(a, b))
    try:
        return a == b
    except Exception:
        return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            exp_cols, exp_types, exp_rows = load_frame(
                con.execute(oracle[name]).fetch_arrow_table())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got_cols, got_types, got_rows = load_frame(pq.read_table(files))
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, x) in enumerate(zip(got_rows, exp_rows)):
            if not all(cmp_cell(a, b) for a, b in zip(g, x)):
                bad = (i, g, x)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: got {bad[1]} exp {bad[2]}")
            if got_types != exp_types:
                print(f"     (dtypes got {got_types} exp {exp_types})")
            n_fail += 1
        else:
            exact = "exact" if got_types == exp_types else f"dtypes differ {got_types}|{exp_types}"
            print(f"PASS {name} ({len(got_rows)} rows, {exact})")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
