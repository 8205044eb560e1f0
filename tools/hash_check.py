#!/usr/bin/env python3
"""STRICT mimic of the driver's hash gate (round-2 replacement for the
tolerant oracle_check.py, per VERDICT.md "What's wrong" #1).

The driver loads the Spark result parquet with pyarrow -> pandas and the
DuckDB oracle result -> pandas, sorts columns by name, sorts rows with
pandas sort_values, then hashes values. That canonicalization is
STRING-LEVEL strict: a DuckDB DECIMAL surfaces as float64 ("123.4") while
a Spark parquet decimal surfaces as decimal.Decimal ("123.40") — same
value, different hash. This checker reproduces that strictness: after
sorting, every cell must have an identical repr()-class and str() on both
sides (no isclose tolerance anywhere).

Usage: python3 tools/hash_check.py /root/testdata/sf0.01 /tmp/verify_out [names...]
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    # the driver sorts with pandas sort_values over all columns; this dies
    # on ndarray cells exactly like the driver's harness does (that is the
    # q39/q59/q60/q70 'err' signature we must not reproduce)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells(df):
    out = []
    for row in df.itertuples(index=False):
        out.append(tuple((type(v).__name__, str(v)) for v in row))
    return out


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    report = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        rec = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        report[name] = rec
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            rec["err"] = "no spark output"
            n_fail += 1
            continue
        try:
            got = canon(pq.read_table(files).to_pandas())
        except Exception as ex:
            print(f"FAIL {name}: spark-side sort error: {type(ex).__name__} {ex}")
            rec["err"] = f"spark-side sort error: {type(ex).__name__}"
            n_fail += 1
            continue
        rec["spark_rows"] = len(got)
        try:
            # arrow fetch, like the driver: DATE -> datetime.date objects
            # (df() would give datetime64 and false-positive date diffs)
            exp = canon(con.execute(oracle[name]).fetch_arrow_table().to_pandas())
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {type(ex).__name__} {ex}")
            rec["err"] = f"oracle error: {type(ex).__name__} {ex}"[:200]
            n_fail += 1
            continue
        rec["oracle_rows"] = len(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            rec["err"] = "column mismatch"
            n_fail += 1
            continue
        rec["schema_match"] = True
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            rec["err"] = "row count mismatch"
            n_fail += 1
            continue
        rec["rows_match"] = True
        g, x = cells(got), cells(exp)
        bad = next((i for i in range(len(g)) if g[i] != x[i]), None)
        if bad is not None:
            diffs = [(c, g[bad][j], x[bad][j])
                     for j, c in enumerate(got.columns) if g[bad][j] != x[bad][j]]
            print(f"FAIL {name}: row {bad}: {diffs[:4]}")
            rec["err"] = f"hash mismatch at row {bad}"
            n_fail += 1
        else:
            rec["hash_match"] = True
            dt = "dtypes=" + ("same" if list(map(str, got.dtypes)) ==
                              list(map(str, exp.dtypes)) else
                              f"DIFF {list(map(str, got.dtypes))} vs {list(map(str, exp.dtypes))}")
            print(f"PASS {name} ({len(g)} rows, {dt})")
            n_pass += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_out} ({len(report)} entries)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
