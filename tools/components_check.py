#!/usr/bin/env python3
"""q66 components oracle via union-find over a q46 edge dump.

The naive recursive-CTE oracle for q66 is measured-infeasible past og10
(its reach CTE materializes the full transitive closure; killed >5
CPU-hours at og30's 4.7M edges). This is the documented substitution
protocol from PROVENANCE_organic_x30.txt, as a committed tool instead of
an ad-hoc script: an independent Python union-find over the q46 id-level
pair dump — q46 emits every qualifying cross pair AND the within-group
cliques, so components over its (da, db) edges with per-component
(min, count, min, max) aggregates are exactly q66's contract output.
The check is only as strong as the edge set: cite the q46 dump's own
verification status (digest vs naive oracle, or Spark-only) wherever the
resulting record is recorded.

Usage:
  python3 tools/components_check.py Q46_DUMP_DIR Q66_DUMP_DIR [--json OUT]
"""
import glob
import json
import sys

import pyarrow.parquet as pq


def read_dir(d, name, cols):
    # ADVICE r14: no wildcard fallback — a missing named subdirectory must
    # fail loudly, never silently read an unrelated dump sharing the dir.
    files = sorted(glob.glob(f"{d}/{name}/*.parquet")) or sorted(
        glob.glob(f"{d}/{name}.parquet/*.parquet")) or sorted(
        glob.glob(f"{d}/{name}.parquet"))
    if not files:
        sys.exit(f"no parquet under {d}/{name}(.parquet) — refusing to glob "
                 f"{d}/*.parquet (could be an unrelated dump)")
    import pyarrow as pa
    t = pa.concat_tables([pq.read_table(f) for f in files])
    missing = [c for c in cols if c not in t.column_names]
    if missing:
        sys.exit(f"{d}/{name}: expected columns {cols}, missing {missing} "
                 f"(have {t.column_names})")
    return t


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    q46_dir, q66_dir = args[0], args[1]
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    t = read_dir(q46_dir, "q46_dedup_ngram_jaccard", ["da", "db"])
    da = t.column("da").to_numpy(zero_copy_only=False)
    db = t.column("db").to_numpy(zero_copy_only=False)

    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(da.tolist(), db.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra

    comp = {}
    nodes = set(da.tolist()) | set(db.tolist())
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    mine = sorted((min(m), len(m), min(m), max(m)) for m in comp.values())

    q66_cols = ["component", "cluster_size", "representative", "max_member"]
    s = read_dir(q66_dir, "q66_dedup_components", q66_cols)
    # schema_match below reflects this check (ADVICE r14: it used to be a
    # hard-coded true); column ORDER is not part of the contract here
    # because the compare reads columns by name.
    schema_ok = all(c in s.column_names for c in q66_cols)
    theirs = sorted(zip(
        s.column("component").to_pylist(), s.column("cluster_size").to_pylist(),
        s.column("representative").to_pylist(), s.column("max_member").to_pylist()))

    ok = mine == theirs
    rec = {"q66_dedup_components": {
        "rows_match": len(mine) == len(theirs),
        "schema_match": schema_ok, "hash_match": ok,
        "spark_rows": len(theirs), "oracle_rows": len(mine), "err": None if ok else "mismatch",
        "oracle_substitution": (
            "independent Python union-find over the q46 edge dump "
            f"({len(da)} edges, {len(nodes)} nodes) -> {len(mine)} components; "
            "naive recursive-CTE oracle measured-infeasible past og10 "
            "(PROVENANCE_organic_x30.txt)")}}
    print(("PASS" if ok else "FAIL") +
          f" q66 components: {len(mine)} union-find vs {len(theirs)} spark rows "
          f"over {len(da)} edges / {len(nodes)} nodes")
    if not ok:
        diff = [(m, t_) for m, t_ in zip(mine, theirs) if m != t_][:5]
        print("first diffs:", diff)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {out_json}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
