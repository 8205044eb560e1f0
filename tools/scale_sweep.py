#!/usr/bin/env python3
"""Top-scale oracle sweep driver (VERDICT r7 directive 3).

Wraps tools/hash_check.py for the scale_up.py corpora (x100/x1000), where
three queries need scale-specific handling the sf0.01/sf0.1/x10 gates
don't:

 - q46/q47: the naive all-pairs DuckDB oracles time out; substitute the
   clone-group oracles from tools/clone_oracles.py (FULL-CONTENT
   equivalent, proven by that module's main at sf0.01+sf0.1).
 - q96: the interval-join answer grows as N^2 in the clone multiple
   (every error copy matches every click copy at the same timestamp) —
   1.36B rows at x100 is infeasible to enumerate on EITHER engine, so the
   check degrades to a derived COUNT: Spark counts the contract query
   in-engine (graft.CountPeek), DuckDB computes the expected count
   arithmetically over clone groups (sum of err_count*click_count over
   qualifying distinct-timestamp pairs — 0.3 s at x100). Full-content
   coverage for q96 lives at x10 (13,645,200 rows hash-exact,
   CORRECTNESS_x10.json).

Usage:
  python3 tools/scale_sweep.py SF_DIR DUMP_DIR --json OUT.json \
      [--digest q44_...,q46_...] [--q96-spark-count N | --skip-q96] [names...]

The q96 Spark-side count comes from `tools/run_main.sh graft.CountPeek
SF_DIR q96_range_join_binned` (run it first; pass the printed rows= value).
DUMP_DIR/oracle_sql.json is patched in place (original saved to
oracle_sql.orig.json) so a bare hash_check.py rerun sees the same oracles.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from clone_oracles import SUBSTITUTED  # noqa: E402

Q96 = "q96_range_join_binned"
Q96_EXPECTED = """
WITH err AS (SELECT epoch_us(ts::TIMESTAMP) AS s, count(*) AS c
             FROM read_parquet('{sf}/events.parquet')
             WHERE event_type='error' GROUP BY 1),
clk AS (SELECT epoch_us(ts::TIMESTAMP) AS us, count(*) AS c
        FROM read_parquet('{sf}/events.parquet')
        WHERE event_type='click' GROUP BY 1)
SELECT coalesce(sum(err.c * clk.c), 0)::BIGINT
FROM err JOIN clk ON clk.us >= err.s AND clk.us < err.s + 900000000
"""


def main():
    args = sys.argv[1:]

    def take(flag, default=None):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    json_out = take("--json")
    digest = take("--digest", "")
    q96_count = take("--q96-spark-count")
    skip_q96 = "--skip-q96" in args
    if skip_q96:
        args.remove("--skip-q96")
    sf_dir, dump_dir = args[0], args[1]
    names = args[2:]

    # 1. patch the dump's oracle file: clone-group substitutes + q96 out
    opath = f"{dump_dir}/oracle_sql.json"
    orig_path = f"{dump_dir}/oracle_sql.orig.json"
    oracle = json.load(open(orig_path if os.path.exists(orig_path) else opath))
    if not os.path.exists(orig_path):
        os.rename(opath, orig_path)
    patched = dict(oracle)
    subs = [n for n in SUBSTITUTED if n in patched]
    for n in subs:
        patched[n] = SUBSTITUTED[n]
    patched.pop(Q96, None)
    with open(opath, "w") as f:
        json.dump(patched, f, indent=1)
    print(f"[sweep] substituted clone-group oracles: {subs}; {Q96} -> derived count")

    # 2. strict hash check on everything else
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "hash_check.py"),
           sf_dir, dump_dir] + names
    if digest:
        cmd += ["--digest", digest]
    if json_out:
        cmd += ["--json", json_out]
    rc = subprocess.call(cmd)

    # 3. q96 derived count check
    if not skip_q96 and (not names or Q96 in names):
        if q96_count is None:
            print(f"[sweep] no --q96-spark-count given; {Q96} left unchecked")
        else:
            import duckdb
            exp = duckdb.connect().execute(Q96_EXPECTED.format(sf=sf_dir)).fetchone()[0]
            got = int(q96_count)
            ok = got == exp
            rec = {"rows_match": ok, "schema_match": None, "hash_match": None,
                   "spark_rows": got, "oracle_rows": int(exp),
                   "err": None if ok else f"derived count mismatch {got} != {exp}",
                   "derived": "count (clone-group arithmetic; full content at x10)"}
            print(f"{'PASS' if ok else 'FAIL'} {Q96} (derived count {got} vs {exp})")
            if json_out:
                rep = json.load(open(json_out))
                rep[Q96] = rec
                with open(json_out, "w") as f:
                    json.dump(rep, f, indent=1)
            if not ok:
                rc = rc or 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
