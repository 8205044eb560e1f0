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

The sweep REFUSES to run against a non-clone corpus (a driver sf dir):
the substituted oracles are only content-equivalent on scale_up.py
output, and patching a driver dump's oracle_sql.json would silently drop
q96 from its gate. Override with --force if you know better.

If q96 is in scope but no --q96-spark-count is given, that is a FAILURE
(rc=1) and an explicit {"err": "unchecked"} record lands in the JSON
report — absence must never read as pass (ADVICE r8).

Usage:
  python3 tools/scale_sweep.py SF_DIR DUMP_DIR --json OUT.json \
      [--digest q44_...,q46_...] [--q96-spark-count N | --skip-q96] \
      [--derived-count q44_dedup_minhash_lsh=N ...] [names...]

--derived-count extends the q96 protocol to the near-dup pair queries
(q44/q45/q46/q47) whose outputs grow quadratically in the clone multiple:
run `graft.CountPeek SF_DIR <name>` for the Spark-side count and pass it
here; the expected side is the clone-group COUNT oracle from
clone_oracles.COUNTS (proven equal to the naive oracle's count(*) at
sf0.01, sf0.1, and x10 by clone_oracles' main + an x10 spot run).

The q96 Spark-side count comes from `tools/run_main.sh graft.CountPeek
SF_DIR q96_range_join_binned` (run it first; pass the printed rows= value).
DUMP_DIR/oracle_sql.json is patched in place (original saved to
oracle_sql.orig.json, the patch recorded in oracle_sql.patch_note.txt —
JSON can't carry comments without breaking hash_check's key iteration) so
a bare hash_check.py rerun sees the same oracles.
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from clone_oracles import SUBSTITUTED, MATERIALIZED, COUNTS  # noqa: E402

# scale_up.py offsets every cloned key by c*STRIDE, c >= 1: a corpus whose
# max doc_id is below STRIDE cannot be a clone corpus (driver sf dirs top
# out around 600k).
STRIDE = 10_000_000

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


def is_clone_corpus(sf_dir):
    import duckdb
    mx = duckdb.connect().execute(
        f"SELECT max(doc_id) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    return mx is not None and mx >= STRIDE


def main():
    ap = argparse.ArgumentParser(
        description="clone-corpus oracle sweep (wraps hash_check.py)")
    ap.add_argument("sf_dir")
    ap.add_argument("dump_dir")
    ap.add_argument("names", nargs="*",
                    help="optional query-name subset (default: all in oracle_sql.json)")
    ap.add_argument("--json", dest="json_out")
    ap.add_argument("--digest", default="",
                    help="comma-separated names routed to the order-independent digest check")
    g = ap.add_mutually_exclusive_group()
    g.add_argument("--q96-spark-count", type=int,
                   help="Spark-side row count for q96 (from graft.CountPeek)")
    g.add_argument("--skip-q96", action="store_true")
    ap.add_argument("--derived-count", action="append", default=[],
                    metavar="NAME=N",
                    help="check NAME by derived count: N is the Spark-side "
                         "row count from graft.CountPeek; the expected side "
                         "is the clone-group COUNT oracle from "
                         "clone_oracles.COUNTS (q44/q45/q46/q47 — for "
                         "quadratic-output pair queries whose full dump is "
                         "infeasible at this scale). Repeatable.")
    ap.add_argument("--force", action="store_true",
                    help="run even if sf_dir does not look like a scale_up.py clone corpus")
    a = ap.parse_args()

    if not a.force and not is_clone_corpus(a.sf_dir):
        print(f"[sweep] REFUSING: {a.sf_dir} does not look like a scale_up.py "
              f"clone corpus (max doc_id < {STRIDE}) — the substituted q46/q47 "
              "oracles and the q96 removal are only valid on clone corpora. "
              "Use --force to override.", file=sys.stderr)
        sys.exit(2)

    derived = {}
    for spec in a.derived_count:
        nm, _, val = spec.partition("=")
        if nm not in COUNTS:
            sys.exit(f"--derived-count {nm}: no COUNT oracle in clone_oracles.COUNTS")
        derived[nm] = int(val)

    # 1. patch the dump's oracle file: clone-group substitutes + q96 out
    opath = f"{a.dump_dir}/oracle_sql.json"
    orig_path = f"{a.dump_dir}/oracle_sql.orig.json"
    oracle = json.load(open(orig_path if os.path.exists(orig_path) else opath))
    if not os.path.exists(orig_path):
        os.rename(opath, orig_path)
    patched = dict(oracle)
    subs = [n for n in SUBSTITUTED if n in patched]
    for n in subs:
        patched[n] = SUBSTITUTED[n]
    # materialized substitutes (q99's linear greedy-packing scan, VERDICT
    # r9 #3): run the exact Python recurrence once, write its parquet next
    # to the dump, patch in the read-back SQL
    mats = [n for n in MATERIALIZED if n in patched]
    for n in mats:
        mat_path = f"{a.dump_dir}/{n}.oracle.parquet"
        patched[n] = MATERIALIZED[n](a.sf_dir, mat_path)
        print(f"[sweep] materialized linear oracle for {n} -> {mat_path}")
    patched.pop(Q96, None)
    for n in derived:
        patched.pop(n, None)
    with open(opath, "w") as f:
        json.dump(patched, f, indent=1)
    with open(f"{a.dump_dir}/oracle_sql.patch_note.txt", "w") as f:
        f.write("oracle_sql.json was patched by tools/scale_sweep.py for a "
                f"clone corpus:\n - substituted clone-group oracles: {subs}\n"
                f" - materialized linear oracles: {mats}\n"
                f" - {Q96} REMOVED (checked via derived count; see "
                "scale_sweep.py docstring)\n"
                + (f" - derived-count checked this run: {sorted(derived)}\n"
                   if derived else "")
                + "original in oracle_sql.orig.json\n")
    print(f"[sweep] substituted clone-group oracles: {subs}; "
          f"materialized: {mats}; {Q96} -> derived count; "
          f"derived-count this run: {sorted(derived)}")

    # 2. strict hash check on everything else
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "hash_check.py"),
           a.sf_dir, a.dump_dir] + a.names
    if a.digest:
        cmd += ["--digest", a.digest]
    if a.json_out:
        cmd += ["--json", a.json_out]
    rc = subprocess.call(cmd)

    # 3. derived count checks (q96 + any --derived-count pair queries)
    def write_rec(qname, rec):
        if a.json_out:
            rep = json.load(open(a.json_out))
            rep[qname] = rec
            with open(a.json_out, "w") as f:
                json.dump(rep, f, indent=1)

    def write_q96(rec):
        write_rec(Q96, rec)

    if derived:
        import duckdb
        dcon = duckdb.connect()
        dcon.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
        for t in ["documents", "embeddings", "events"]:
            dcon.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                         f"read_parquet('{a.sf_dir}/{t}.parquet')")
        for nm, got in sorted(derived.items()):
            exp = dcon.execute(COUNTS[nm]).fetchone()[0]
            ok = got == int(exp)
            write_rec(nm, {"rows_match": ok, "schema_match": None,
                           "hash_match": None, "spark_rows": got,
                           "oracle_rows": int(exp),
                           "err": None if ok else f"derived count mismatch {got} != {exp}",
                           "derived": "count (clone-group arithmetic; "
                                      "full content at x100)"})
            print(f"{'PASS' if ok else 'FAIL'} {nm} (derived count {got} vs {exp})")
            if not ok:
                rc = rc or 1

    if not a.skip_q96 and (not a.names or Q96 in a.names):
        if a.q96_spark_count is None:
            # unchecked must be a FAILURE, not silence (ADVICE r8): q96 was
            # popped from oracle_sql.json so hash_check skipped it too.
            print(f"FAIL {Q96}: no --q96-spark-count given — unchecked")
            write_q96({"rows_match": False, "schema_match": False,
                       "hash_match": False, "spark_rows": None,
                       "oracle_rows": None,
                       "err": "unchecked: --q96-spark-count not provided"})
            rc = rc or 1
        else:
            import duckdb
            exp = duckdb.connect().execute(
                Q96_EXPECTED.format(sf=a.sf_dir)).fetchone()[0]
            got = a.q96_spark_count
            ok = got == exp
            write_q96({"rows_match": ok, "schema_match": None, "hash_match": None,
                       "spark_rows": got, "oracle_rows": int(exp),
                       "err": None if ok else f"derived count mismatch {got} != {exp}",
                       "derived": "count (clone-group arithmetic; full content at x10)"})
            print(f"{'PASS' if ok else 'FAIL'} {Q96} (derived count {got} vs {exp})")
            if not ok:
                rc = rc or 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
