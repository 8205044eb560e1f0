#!/usr/bin/env python3
"""Pair-dump oracle substitution (q44/q46) for corpora where the naive single-shot oracle
is measured-infeasible (round 15, VERDICT r14 #2; og300: four documented
DuckDB attempts in PROVENANCE_organic_x300.txt — spill-ENOSPC / OOM).

Two independent halves, both running the UNCHANGED oracle SQL (read from
the dump's own oracle_sql.json) against a RESTRICTED `documents` view —
q44's semantics are pairwise-local (a pair's band collision and exact
Jaccard depend only on the two texts), so the oracle run on any doc
subset equals the full answer restricted to pairs inside that subset:

  soundness   — deterministically sample ~1/R of the dump's pairs
                (hash(da, db) % R = 0), restrict `documents` to the
                sampled pairs' endpoint docs, re-run the oracle, and
                require every sampled pair to reappear with an identical
                jacc. The restricted oracle also emits every OTHER
                qualifying pair among sampled docs — each must exist in
                the full dump (a free completeness check over the
                sampled-doc-induced subgraph).

  completeness — partition docs into S slices by doc_id % S and run the
                oracle per slice, comparing EXACT full contents (EXCEPT
                both ways) against the dump filtered to within-slice
                pairs. scale_up.py's STRIDE = 10,000,000 is divisible by
                any S | 16, so all copies of one base doc share a slice:
                same-base cross-copy pairs (the dominant near-dup mass)
                are covered ~exhaustively, cross-base pairs at ~1/S.

Works for any dedup query whose dump is (da, db, jacc) id pairs with
pairwise-local semantics and whose oracle SQL reads only `documents`:
q44 (banded oracle: large samples are cheap) and q46 (all-pairs oracle:
keep --sample-mod high enough that the sampled-doc subset stays small —
the restricted oracle is quadratic in it).

Usage:
  python3 tools/pair_scale_check.py SF_DIR DUMP_DIR [--query q44_dedup_minhash_lsh]
      [--slices 16] [--sample-mod 2359] [--mem 24GB] [--threads 8] [--json OUT]
      [--cache DIR] [--precompute-only]
DUMP_DIR must contain <query>/*.parquet and oracle_sql.json.

--cache DIR (round 15): the completeness slices' oracle runs depend only
on the corpus, not the dump, so they can be computed WHILE the Spark-side
K-pass sweep is still producing the dump. Each slice's oracle result is
persisted to DIR/<query>_<fp>_slice_<s>_of_<S>.parquet on first
computation and loaded from there on later runs — <fp> fingerprints the
(oracle SQL, corpus path+bytes) pair, so a regenerated corpus or edited
oracle misses and recomputes instead of silently loading a stale slice
(ADVICE r15); with --precompute-only the tool
computes all missing slice files and exits without touching the dump
(DUMP_DIR then only needs to contain oracle_sql.json — e.g. any
graft.Verify output dir). The compare step is unchanged either way: the
cached file IS the oracle slice result, byte-identical to computing it
in-line, and the emitted JSON records cached=true per slice.
"""
import argparse
import glob
import hashlib
import json
import os
import sys
import time

import duckdb


def corpus_fingerprint(sf_dir, oracle_sql):
    """Short hash binding a slice-cache file to (oracle SQL, corpus).
    ADVICE r15: a cache keyed only by (query, slice, slices) silently
    loads stale slices after the corpus is regenerated or the oracle SQL
    edited. Corpus identity = abspath + total documents.parquet bytes
    (scale_up.py is deterministic, so same recipe -> same bytes; a
    regenerated DIFFERENT corpus at the same path changes size, and the
    common failure — pointing --cache at a dir built for another corpus
    or another oracle revision — changes the path or the SQL)."""
    doc = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    if os.path.isdir(doc):
        size = sum(os.path.getsize(f)
                   for f in glob.glob(os.path.join(doc, "*.parquet")))
    else:
        size = os.path.getsize(doc)
    h = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|{size}|{oracle_sql}".encode()).hexdigest()
    return h[:12]


def main():
    ap = argparse.ArgumentParser(
        description="sampled+sliced oracle substitution for pair dumps")
    ap.add_argument("sf_dir")
    ap.add_argument("dump_dir")
    ap.add_argument("--query", default="q44_dedup_minhash_lsh")
    # the non-key value column carried per pair (jacc for q44/q46,
    # hamming for q45) — compared exactly everywhere a pair is compared
    ap.add_argument("--val-col", dest="val", default="jacc")
    ap.add_argument("--slices", type=int, default=16)
    ap.add_argument("--sample-mod", type=int, default=2359)
    ap.add_argument("--mem", default="24GB")
    ap.add_argument("--threads", default="8")
    ap.add_argument("--json", dest="out_json", default=None)
    ap.add_argument("--cache", default=None)
    ap.add_argument("--precompute-only", action="store_true")
    # Partial-coverage compare (round 16): only slices 0..N-1 are oracle-
    # compared; the JSON records compared vs total slices and the covered
    # dump-row fraction, so the completeness claim is explicitly scoped
    # (the og1000 q45 precedent verified 47% of its dump this way). The
    # slicing key still uses --slices, so same-base copies stay co-sliced.
    ap.add_argument("--max-slices", type=int, default=None)
    a = ap.parse_args()
    sf_dir, dump_dir, query, val = a.sf_dir, a.dump_dir, a.query, a.val
    slices, sample_mod = a.slices, a.sample_mod
    out_json, cache, precompute_only = a.out_json, a.cache, a.precompute_only

    oracle_sql = json.load(open(f"{dump_dir}/oracle_sql.json"))[query]
    # cache keying (ADVICE r15): the fingerprint is part of the filename,
    # so a stale cache (regenerated corpus / edited oracle SQL) MISSES and
    # recomputes instead of silently loading; a sidecar manifest records
    # the inputs so a human can see what a cache dir was built against.
    fp = corpus_fingerprint(sf_dir, oracle_sql)

    con = duckdb.connect()
    con.execute(f"SET memory_limit='{a.mem}'")
    con.execute(f"SET threads={a.threads}")
    con.execute("SET preserve_insertion_order=false")
    docs = f"read_parquet('{sf_dir}/documents.parquet')"

    def slice_file(s):
        return (f"{cache}/{query}_{fp}_slice_{s}_of_{slices}.parquet"
                if cache else None)

    if cache:
        stale = [f for f in glob.glob(f"{cache}/{query}_slice_*.parquet")]
        if stale:
            print(f"WARNING: {len(stale)} unfingerprinted cache files for "
                  f"{query} under {cache} are IGNORED (pre-fingerprint "
                  "format; recompute writes fingerprinted names)")
        os.makedirs(cache, exist_ok=True)
        manifest = f"{cache}/{query}_{fp}.manifest.json"
        if not os.path.exists(manifest):
            with open(manifest, "w") as f:
                json.dump({"query": query, "sf_dir": os.path.abspath(sf_dir),
                           "oracle_sql_sha256": hashlib.sha256(
                               oracle_sql.encode()).hexdigest(),
                           "fingerprint": fp, "slices": slices}, f, indent=1)

    def drop_oracle_slice():
        # DuckDB's DROP <type> IF EXISTS errors (not no-ops) when the name is
        # bound to the OTHER type, so try both.
        for stmt in ("DROP VIEW IF EXISTS oracle_slice",
                     "DROP TABLE IF EXISTS oracle_slice"):
            try:
                con.execute(stmt)
            except duckdb.CatalogException:
                pass

    def build_oracle_slice(s):
        """(Re)build the oracle_slice relation for slice s; returns cached flag.
        Cached file = the persisted result of the IDENTICAL restricted run."""
        f = slice_file(s)
        drop_oracle_slice()
        if f and os.path.exists(f):
            con.execute(f"""CREATE TEMP VIEW oracle_slice AS
                SELECT * FROM read_parquet('{f}')""")
            # ADVICE r15: a wrong/hand-placed cache file must fail HERE
            # with its name, not later as a confusing binder error
            cols = {r[0] for r in con.execute(
                "DESCRIBE oracle_slice").fetchall()}
            missing = {"da", "db", val} - cols
            if missing:
                sys.exit(f"cache file {f} lacks expected columns "
                         f"{sorted(missing)} (has {sorted(cols)}) — "
                         "remove it or fix --val-col")
            return True
        con.execute(f"""CREATE OR REPLACE VIEW documents AS
            SELECT * FROM {docs} WHERE doc_id % {slices} = {s}""")
        con.execute(f"CREATE TEMP TABLE oracle_slice AS {oracle_sql}")
        if f:
            os.makedirs(cache, exist_ok=True)
            con.execute(f"COPY oracle_slice TO '{f}' (FORMAT parquet)")
        return False

    if precompute_only:
        if not cache:
            sys.exit("--precompute-only requires --cache DIR")
        for s in range(slices):
            t1 = time.time()
            was_cached = build_oracle_slice(s)
            n = con.execute("SELECT count(*) FROM oracle_slice").fetchone()[0]
            print(f"precompute slice {s}/{slices}: {n:,} oracle rows "
                  f"({'cached' if was_cached else f'{time.time() - t1:.1f} s'})",
                  flush=True)
        print(f"precompute done: {slices} slices under {cache}")
        sys.exit(0)

    files = sorted(glob.glob(f"{dump_dir}/{query}/*.parquet")) or \
        sorted(glob.glob(f"{dump_dir}/{query}.parquet/*.parquet")) or \
        sorted(glob.glob(f"{dump_dir}/{query}.parquet"))
    if not files:
        sys.exit(f"no {query} dump under {dump_dir}")
    flist = "[" + ",".join(f"'{f}'" for f in files) + "]"
    con.execute(f"CREATE VIEW dump AS SELECT * FROM read_parquet({flist})")
    rec = {"dump_rows": con.execute("SELECT count(*) FROM dump").fetchone()[0]}
    print(f"dump rows: {rec['dump_rows']:,}")

    # ---------------- soundness ----------------
    t0 = time.time()
    con.execute(f"""CREATE TEMP TABLE sample AS
        SELECT da, db, {val} AS v FROM dump WHERE hash(da, db) % {sample_mod} = 0""")
    con.execute("""CREATE TEMP TABLE sample_ids AS
        SELECT DISTINCT da AS id FROM sample UNION SELECT DISTINCT db FROM sample""")
    n_sample, n_ids = con.execute(
        "SELECT (SELECT count(*) FROM sample), (SELECT count(*) FROM sample_ids)"
    ).fetchone()
    con.execute(f"""CREATE OR REPLACE VIEW documents AS
        SELECT d.* FROM {docs} d JOIN sample_ids s ON d.doc_id = s.id""")
    con.execute(f"CREATE TEMP TABLE oracle_sound AS {oracle_sql}")
    n_oracle = con.execute("SELECT count(*) FROM oracle_sound").fetchone()[0]
    bad_sound = con.execute(f"""SELECT count(*) FROM sample s
        LEFT JOIN oracle_sound o ON o.da = s.da AND o.db = s.db
        WHERE o.da IS NULL OR o.{val} <> s.v""").fetchone()[0]
    # induced-subgraph completeness for free: every qualifying pair among
    # sampled docs must be in the full dump with the same jacc
    bad_induced = con.execute(f"""SELECT count(*) FROM oracle_sound o
        LEFT JOIN dump d ON d.da = o.da AND d.db = o.db
        WHERE d.da IS NULL OR d.{val} <> o.{val}""").fetchone()[0]
    rec["soundness"] = {
        "sample_mod": sample_mod, "sampled_pairs": n_sample,
        "sampled_docs": n_ids, "oracle_pairs_on_sampled_docs": n_oracle,
        "sampled_pairs_missing_or_jacc_mismatch": bad_sound,
        "induced_oracle_pairs_missing_from_dump": bad_induced,
        "sec": round(time.time() - t0, 1)}
    print(f"soundness: {n_sample:,} sampled pairs / {n_ids:,} docs -> "
          f"{bad_sound} bad, induced {n_oracle:,} oracle pairs -> "
          f"{bad_induced} missing ({rec['soundness']['sec']} s)")

    # ---------------- sliced completeness ----------------
    # one dump scan up front: materialize the within-slice rows (~1/S of
    # the dump) instead of re-scanning the full dump parquet per slice
    con.execute(f"""CREATE TEMP TABLE dump_ws AS
        SELECT da, db, {val}, da % {slices} AS sl FROM dump
        WHERE da % {slices} = db % {slices}""")
    slice_recs = []
    total_bad = bad_sound + bad_induced
    compare_n = slices if a.max_slices is None else min(a.max_slices, slices)
    for s in range(compare_n):
        t1 = time.time()
        was_cached = build_oracle_slice(s)
        n_o, n_d, miss, extra = con.execute(f"""
            WITH ds AS (SELECT da, db, {val} FROM dump_ws WHERE sl = {s})
            SELECT (SELECT count(*) FROM oracle_slice),
                   (SELECT count(*) FROM ds),
                   (SELECT count(*) FROM (
                      SELECT da, db, {val} FROM oracle_slice
                      EXCEPT SELECT da, db, {val} FROM ds)),
                   (SELECT count(*) FROM (
                      SELECT da, db, {val} FROM ds
                      EXCEPT SELECT da, db, {val} FROM oracle_slice))""").fetchone()
        ok = miss == 0 and extra == 0 and n_o == n_d
        total_bad += miss + extra
        slice_recs.append({"slice": s, "oracle_rows": n_o, "dump_rows": n_d,
                           "missing_from_dump": miss, "extra_in_dump": extra,
                           "cached": was_cached,
                           "sec": round(time.time() - t1, 1)})
        print(f"slice {s}/{slices}: oracle {n_o:,} vs dump {n_d:,} "
              f"miss={miss} extra={extra} {'OK' if ok else 'FAIL'} "
              f"({slice_recs[-1]['sec']} s)")
    rec["slices"] = slice_recs
    rec["slices_compared"] = compare_n
    rec["slices_total"] = slices
    covered = sum(r["dump_rows"] for r in slice_recs)
    rec["covered_dump_rows"] = covered
    rec["covered_dump_fraction"] = round(covered / rec["dump_rows"], 4)
    rec["pass"] = total_bad == 0
    print(("PASS" if rec["pass"] else "FAIL") +
          f" {query} scale check: soundness {n_sample:,} pairs exact, "
          f"{compare_n}/{slices} completeness slices exact-compared "
          f"({covered:,} within-slice dump rows = "
          f"{rec['covered_dump_fraction']:.1%} of the dump)")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {out_json}")
    sys.exit(0 if rec["pass"] else 1)


if __name__ == "__main__":
    main()
