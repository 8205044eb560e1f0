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
import os
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


def digest_check(con, name, files, sql, rec):
    """Order-independent full-content compare for results too large for the
    pandas sort path (×1000: sessionize ≈ 95M rows). Both sides run through
    the SAME DuckDB cast-to-VARCHAR canonicalization, so this keeps the
    strict checker's type discipline: a double-vs-decimal drift changes the
    VARCHAR form and fails the digest exactly like it fails the cell check.
    Digest = count(*) + sum(hash(row)) with columns in sorted-name order,
    NULL distinguished from '' via a sentinel. sum (not xor) so duplicate
    rows can't cancel out."""
    flist = "[" + ",".join(f"'{f}'" for f in files) + "]"
    con.execute(f"CREATE OR REPLACE VIEW _spark_side AS SELECT * FROM read_parquet({flist})")
    con.execute(f"CREATE OR REPLACE VIEW _oracle_side AS {sql}")
    s_types = dict(con.execute(
        "SELECT column_name, column_type FROM (DESCRIBE _spark_side)").fetchall())
    o_types = dict(con.execute(
        "SELECT column_name, column_type FROM (DESCRIBE _oracle_side)").fetchall())
    if sorted(s_types) != sorted(o_types):
        rec["err"] = f"column mismatch: {sorted(s_types)} != {sorted(o_types)}"
        print(f"FAIL {name}: {rec['err']}")
        return False
    if s_types != o_types:
        diff = {c: (s_types[c], o_types[c]) for c in s_types if s_types[c] != o_types[c]}
        rec["err"] = f"column type mismatch: {diff}"
        print(f"FAIL {name}: {rec['err']}")
        return False
    rec["schema_match"] = True
    cols = ", ".join(
        f"coalesce(\"{c}\"::VARCHAR, chr(0))" for c in sorted(s_types))
    dig = (f"SELECT count(*)::BIGINT, sum(hash(concat_ws(chr(31), {cols})))::HUGEINT "
           "FROM {}")
    sn, sh = con.execute(dig.format("_spark_side")).fetchone()
    on, oh = con.execute(dig.format("_oracle_side")).fetchone()
    rec["spark_rows"], rec["oracle_rows"] = sn, on
    if sn != on:
        rec["err"] = f"row count mismatch {sn} != {on}"
        print(f"FAIL {name}: rows {sn} != {on}")
        return False
    rec["rows_match"] = True
    if sh != oh:
        rec["err"] = "content digest mismatch"
        print(f"FAIL {name}: digest {sh} != {oh} over {sn} rows")
        return False
    rec["hash_match"] = True
    rec["digest"] = True
    print(f"PASS {name} ({sn} rows, order-independent digest)")
    return True


def exact_check(con, name, files, sql, rec):
    """The driver-mimic strict cell compare (small/medium results)."""
    try:
        got = canon(pq.read_table(files).to_pandas())
    except Exception as ex:
        print(f"FAIL {name}: spark-side sort error: {type(ex).__name__} {ex}")
        rec["err"] = f"spark-side sort error: {type(ex).__name__}"
        return False
    rec["spark_rows"] = len(got)
    try:
        # arrow fetch, like the driver: DATE -> datetime.date objects
        # (df() would give datetime64 and false-positive date diffs)
        exp = canon(con.execute(sql).fetch_arrow_table().to_pandas())
    except Exception as ex:
        print(f"FAIL {name}: oracle error: {type(ex).__name__} {ex}")
        rec["err"] = f"oracle error: {type(ex).__name__} {ex}"[:200]
        return False
    rec["oracle_rows"] = len(exp)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        rec["err"] = "column mismatch"
        return False
    rec["schema_match"] = True
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        rec["err"] = "row count mismatch"
        return False
    rec["rows_match"] = True
    g, x = cells(got), cells(exp)
    bad = next((i for i in range(len(g)) if g[i] != x[i]), None)
    if bad is not None:
        diffs = [(c, g[bad][j], x[bad][j])
                 for j, c in enumerate(got.columns) if g[bad][j] != x[bad][j]]
        print(f"FAIL {name}: row {bad}: {diffs[:4]}")
        rec["err"] = f"hash mismatch at row {bad}"
        return False
    rec["hash_match"] = True
    dt = "dtypes=" + ("same" if list(map(str, got.dtypes)) ==
                      list(map(str, exp.dtypes)) else
                      f"DIFF {list(map(str, got.dtypes))} vs {list(map(str, exp.dtypes))}")
    print(f"PASS {name} ({len(g)} rows, {dt})")
    return True


def run_one(task):
    """One query's full check in an expendable worker process. DuckDB's
    buffer pool does not reliably return a finished x1000-scale window
    oracle's memory to the OS — a same-process retry then dies on
    kilobyte allocations even on a FRESH connection (round-10 lesson,
    third form) — so each query gets a fresh PROCESS and the OS reclaims
    everything at exit."""
    sf_dir, out_dir, name, sql, is_digest = task
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        rec["err"] = "no spark output"
        return name, rec, False
    try:
        con = duckdb.connect()
        con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        # optional thread cap so a long oracle run can coexist with a
        # concurrent Spark dump on the same box (default: all cores)
        if os.environ.get("GRAFT_DUCKDB_THREADS"):
            con.execute(f"SET threads TO {int(os.environ['GRAFT_DUCKDB_THREADS'])}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        if is_digest:
            ok = digest_check(con, name, files, sql, rec)
        else:
            ok = exact_check(con, name, files, sql, rec)
    except Exception as ex:
        print(f"FAIL {name}: oracle engine error: {type(ex).__name__} {ex}")
        rec["err"] = f"oracle engine error: {type(ex).__name__} {ex}"[:200]
        ok = False
    return name, rec, ok


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    digest_names = set()
    if "--digest" in args:
        i = args.index("--digest")
        digest_names = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    report = {}

    # Memory-bound the oracle engine (round-10 lesson: a near-default
    # ~80%-of-RAM DuckDB limit collided with a concurrent 96g-heap Spark
    # JVM and the kernel OOM-killed both mid-sweep). 48GB + a disk spill
    # dir keeps the heavy window/join oracles correct-but-spilling instead
    # of dead; override with GRAFT_DUCKDB_MEM. Process-per-query isolation
    # (run_one's docstring) is what makes one oracle's memory actually
    # come back before the next starts.
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0

    # incremental checkpoint: an engine crash 90 minutes into an x1000
    # sweep must not lose the completed per-query records (round-10
    # lesson — twice)
    def flush():
        if json_out:
            with open(json_out, "w") as f:
                json.dump(report, f, indent=1)

    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    for name in sorted(oracle):
        if only and name not in only:
            continue
        flush()  # checkpoint completed records before starting this query
        task = (sf_dir, out_dir, name, oracle[name], name in digest_names)
        # fresh worker per query; maxtasksperchild=1 guarantees the child
        # exits (and the OS reclaims the oracle's memory) before the next
        with ctx.Pool(1, maxtasksperchild=1) as pool:
            try:
                _, rec, ok = pool.apply(run_one, (task,))
            except Exception as ex:
                rec = {"rows_match": False, "schema_match": False,
                       "hash_match": False, "spark_rows": None,
                       "oracle_rows": None,
                       "err": f"worker died: {type(ex).__name__} {ex}"[:200]}
                print(f"FAIL {name}: worker died: {type(ex).__name__} {ex}")
                ok = False
        report[name] = rec
        if ok:
            n_pass += 1
        else:
            n_fail += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {json_out} ({len(report)} entries)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
