"""Substituted DuckDB oracles for clone-multiplied corpora (x100/x1000).

The contract oracles for the near-dup pair queries are all-pairs joins:
exact, but O(n^2) in DuckDB, which times out at x100 (q46/q47 > 300 s vs
q44's 275 s; q66's edge derivation is the same join and ran >20 min at
x100 before substitution). These substitutes keep the SAME arithmetic (identical fold
dot / md5 grams / round calls), restructured around clone groups: an xN
`tools/scale_up.py` corpus clones each sf0.1 row N times with only key
offsets, so distinct-content groups are exactly the sf0.1 rows. All-pairs
work runs over DISTINCT contents (feasible at any N) and qualifying pairs
expand back to id pairs, giving a FULL-CONTENT result identical to the
naive oracle (measured at x100: q46 43 s for 34M pairs, q47 11 s for
10.8M — vs both >300 s naive).

Soundness is proven, not assumed: `python3 tools/clone_oracles.py <sfDir>
<oracle_sql.json>` runs substituted-vs-original EXCEPT both ways at a
scale where the naive oracle is feasible (empty diff + equal counts
required; green at sf0.01 and sf0.1). ONLY valid on scale_up.py corpora —
the driver's own sf dirs are not clone-structured, but there the naive
oracles are feasible anyway.
"""

FOLD = ("list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len({a})+1),"
        " i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, v) -> acc + v)")

def dot(a, b):
    return FOLD.format(a=a, b=b)

GRAMS = ("list_distinct(list_transform(range(1, length(text) - 2), "
         "i -> ('0x' || substr(md5(substr(text, i, 4)),1,8))::BIGINT))")

Q46 = f"""
WITH f AS (SELECT doc_id, text FROM documents
           WHERE text LIKE '%dup%' AND length(text) >= 4),
g AS (SELECT text, list(doc_id) AS ids, min(doc_id) AS rep, {GRAMS} AS grams
      FROM f GROUP BY text),
cp AS (
  SELECT a.ids AS ia, b.ids AS ib,
    round(len(list_intersect(a.grams, b.grams)) / len(list_distinct(a.grams || b.grams)), 6) AS jacc
  FROM g a JOIN g b ON a.rep < b.rep
  WHERE round(len(list_intersect(a.grams, b.grams)) / len(list_distinct(a.grams || b.grams)), 6) >= 0.35),
xc AS (
  SELECT least(x.i, y.j) AS da, greatest(x.i, y.j) AS db, jacc
  FROM cp, unnest(ia) AS x(i), unnest(ib) AS y(j)),
sp AS (
  SELECT x.i AS da, y.j AS db,
    round(len(list_intersect(grams, grams)) / len(list_distinct(grams || grams)), 6) AS jacc
  FROM g, unnest(ids) AS x(i), unnest(ids) AS y(j)
  WHERE x.i < y.j
    AND round(len(list_intersect(grams, grams)) / len(list_distinct(grams || grams)), 6) >= 0.35)
SELECT da, db, jacc FROM (SELECT * FROM xc UNION ALL SELECT * FROM sp) u
ORDER BY da, db
"""

Q47 = f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
g0 AS (SELECT label, embedding, list(vec_id) AS ids, min(vec_id) AS rep
       FROM e GROUP BY label, embedding),
g AS (SELECT label, embedding, ids, rep,
        sqrt({dot('embedding', 'embedding')}) AS nrm
      FROM g0),
cp AS (
  SELECT a.ids AS ia, b.ids AS ib, a.label AS label,
    round({dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos_sim
  FROM g a JOIN g b ON a.label = b.label AND a.rep < b.rep
  WHERE round({dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) >= 0.4),
xc AS (
  SELECT least(x.i, y.j) AS va, greatest(x.i, y.j) AS vb, label, cos_sim
  FROM cp, unnest(ia) AS x(i), unnest(ib) AS y(j)),
sp AS (
  SELECT x.i AS va, y.j AS vb, label,
    round({dot('embedding', 'embedding')} / (nrm * nrm), 6) AS cos_sim
  FROM g, unnest(ids) AS x(i), unnest(ids) AS y(j)
  WHERE x.i < y.j
    AND round({dot('embedding', 'embedding')} / (nrm * nrm), 6) >= 0.4)
SELECT va, vb, label, cos_sim FROM (SELECT * FROM xc UNION ALL SELECT * FROM sp) u
ORDER BY va, vb
"""

# q66 (dedup clustering): the contract oracle derives its edge set with the
# SAME all-pairs n-gram join as q46 (gd a JOIN gd b), then runs a doc-level
# recursive closure — at x100 (~50k '%dup%' docs → 1.2B candidate pairs of
# list_intersect calls) the edge derivation alone runs for hours. Group-level
# restatement: docs grouped by text form cliques (identical grams → jacc = 1
# ≥ 0.35 whenever len(text) ≥ 4 guarantees a non-empty gram list), and a
# cross-group edge between ANY copy pair exists iff it exists between the
# group texts — so the doc-level component structure is exactly the
# component structure of the distinct-text graph, with each group's full id
# list riding along. Nodes mirror the original's "has ≥1 edge" rule: every
# member of a multi-doc group (within-group edges), plus singleton groups
# with a cross edge. Same round/md5/jacc arithmetic, recursion over ~500
# groups instead of ~50k docs. Exact on ANY corpus (not just clone corpora);
# proven vs the original by this module's main at sf0.01 + sf0.1.
Q66 = f"""
WITH RECURSIVE f AS (
  SELECT doc_id, text FROM documents
  WHERE text LIKE '%dup%' AND length(text) >= 4),
g AS (SELECT text, list(doc_id) AS ids, min(doc_id) AS rep, count(*) AS n,
             {GRAMS} AS grams
      FROM f GROUP BY text),
ge AS (
  SELECT a.rep AS ra, b.rep AS rb
  FROM g a JOIN g b ON a.rep < b.rep
  WHERE round(len(list_intersect(a.grams, b.grams)) / len(list_distinct(a.grams || b.grams)), 6) >= 0.35),
bidir AS (SELECT ra AS a, rb AS b FROM ge UNION SELECT rb, ra FROM ge),
gnodes AS (SELECT rep AS node FROM g WHERE n >= 2
           UNION SELECT a FROM bidir),
reach(node, r) AS (
  SELECT node, node FROM gnodes
  UNION
  SELECT reach.node, bidir.b FROM reach JOIN bidir ON reach.r = bidir.a),
gcc AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
memb AS (
  SELECT gcc.component, x.i AS id
  FROM gcc JOIN g ON gcc.node = g.rep, unnest(g.ids) AS x(i))
SELECT component, COUNT(*) AS cluster_size,
  min(id) AS representative, max(id) AS max_member
FROM memb GROUP BY component
ORDER BY component
"""

# q85 (SQ8 recall audit): the contract oracle dequantizes by exploding
# every embedding to (vec_id, pos, v) — 128M rows at x1000 — joining
# per-dim stats, and REBUILDING each vector with `list(dv ORDER BY pos)
# GROUP BY vec_id`. That ordered-list regroup is the memory hog: it OOMs a
# 96 GB DuckDB at x1000 (unspillable list-agg state across 2M groups).
# Restatement: per-dim mins/maxes are collected once into two 64-element
# lists and the dequantized vector is built with a single list_transform
# index lookup — the SAME `mn + round((v-mn)/(mx-mn)*255)/255.0*(mx-mn)`
# arithmetic per element, no explode/regroup. Exact on ANY corpus; proven
# vs the original by this module's main at sf0.01 + sf0.1, and by an
# EXCEPT-ALL-both-ways spot run at x10 (4 s) and x100 (45 s, 64 GB limit)
# — the largest scales where the original still completes.
Q85 = f"""
WITH stats AS (
  SELECT pos, min(CAST(v AS DOUBLE)) AS mn, max(CAST(v AS DOUBLE)) AS mx
  FROM (SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
        FROM embeddings) dims
  GROUP BY pos),
sl AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM stats),
dn AS (
  SELECT vec_id, dvec, sqrt({dot('dvec', 'dvec')}) AS dnrm FROM (
    SELECT vec_id,
      list_transform(range(1, len(embedding)+1),
        i -> mns[i] + round((embedding[i]::DOUBLE - mns[i]) / (mxs[i] - mns[i]) * 255)
             / 255.0 * (mxs[i] - mns[i])) AS dvec
    FROM embeddings, sl) t),
e AS (
  SELECT vec_id, embedding, sqrt({dot('embedding', 'embedding')}) AS nrm
  FROM embeddings),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT q.vec_id AS qid, e.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        ORDER BY round({dot('q.embedding', 'e.embedding')} / (q.nrm * e.nrm), 6) DESC,
                 e.vec_id) AS rn
    FROM e q JOIN e ON e.vec_id != q.vec_id WHERE q.vec_id < 5) t
  WHERE rn <= 10),
approx AS (
  SELECT qid, vec_id FROM (
    SELECT q.vec_id AS qid, d.vec_id,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        ORDER BY round({dot('q.dvec', 'd.dvec')} / (q.dnrm * d.dnrm), 6) DESC,
                 d.vec_id) AS rn
    FROM dn q JOIN dn d ON d.vec_id != q.vec_id WHERE q.vec_id < 5) t
  WHERE rn <= 10)
SELECT exact.qid, CAST(COUNT(approx.vec_id) AS BIGINT) AS n_overlap,
  round(COUNT(approx.vec_id) / CAST(10 AS DOUBLE), 2) AS recall10
FROM exact LEFT JOIN approx
  ON exact.qid = approx.qid AND exact.vec_id = approx.vec_id
GROUP BY exact.qid ORDER BY exact.qid
"""

SUBSTITUTED = {"q46_dedup_ngram_jaccard": Q46, "q47_dedup_embedding_cosine": Q47,
               "q66_dedup_components": Q66, "q85_embedding_sq8": Q85}

# --------------------------------------------------------------------------
# Derived COUNT oracles (the q96 protocol, extended to the near-dup pair
# queries): on a clone corpus the pair answers grow quadratically in the
# clone multiple (q44 ≈ 2.7B rows at x1000) — too large to dump and hash on
# EITHER engine — so the top-scale check compares the Spark-side count
# (graft.CountPeek runs the real contract query and counts in-engine)
# against a count computed arithmetically over clone groups: all-pairs
# work runs over DISTINCT contents (signatures/grams/simhashes are pure
# functions of text, so clones share them), a qualifying cross-content
# pair contributes |ids_a|*|ids_b| doc pairs, and every multi-member group
# contributes C(n,2) within-group pairs (identical contents always collide
# in every band and pass the similarity filter at its maximum). Same
# md5/round/threshold arithmetic as the originals; proven equal to
# `SELECT count(*) FROM (original)` by this module's main at sf0.01 +
# sf0.1. Full-content coverage for all four lives at x100
# (CORRECTNESS_x100.json, hash-exact).
# --------------------------------------------------------------------------

_SIG16 = ",\n    ".join(
    f"list_min(list_transform(h, x -> ({2*i+3}*x + {104729*i+12345}) % 1000000007)) AS s{i}"
    for i in range(16))
_BANDS4 = "\n  UNION ALL ".join(
    f"SELECT text, {b} AS b, md5(s{4*b}::VARCHAR || '_' || s{4*b+1}::VARCHAR || '_' "
    f"|| s{4*b+2}::VARCHAR || '_' || s{4*b+3}::VARCHAR) AS bh FROM sig"
    for b in range(4))

Q44_COUNT = f"""
WITH d AS (SELECT text, count(*) AS n FROM documents GROUP BY text),
t AS (SELECT text, n, string_split(text, ' ') AS toks FROM d
      WHERE len(string_split(text, ' ')) >= 3),
hs AS (
  SELECT text, n,
    list_distinct(list_transform(
      list_transform(range(1, len(toks)-1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
      s -> ('0x' || substr(md5(s),1,8))::BIGINT)) AS h
  FROM t),
sig AS (SELECT text, h,
    {_SIG16}
  FROM hs),
bands AS (
  {_BANDS4}),
cand AS (
  SELECT DISTINCT a.text AS ta, b.text AS tb
  FROM bands a JOIN bands b ON a.b = b.b AND a.bh = b.bh AND a.text < b.text),
crossq AS (
  SELECT x.n * y.n AS m
  FROM cand JOIN hs x ON x.text = ta JOIN hs y ON y.text = tb
  WHERE round(len(list_intersect(x.h, y.h)) / len(list_distinct(x.h || y.h)), 6) >= 0.6),
selfq AS (SELECT n*(n-1)//2 AS m FROM hs WHERE n >= 2)
SELECT (coalesce((SELECT sum(m) FROM crossq), 0)
      + coalesce((SELECT sum(m) FROM selfq), 0))::BIGINT
"""

Q45_COUNT = """
WITH d AS (SELECT text, count(*) AS n FROM documents
           WHERE text LIKE '%dup%' GROUP BY text),
t AS (SELECT text, n,
    list_transform(string_split(text, ' '), w -> ('0x' || substr(md5(w),1,15))::BIGINT) AS h
  FROM d),
s AS (
  SELECT text, n,
    list_sum(list_transform(range(0, 60), bb ->
      CASE WHEN list_sum(list_transform(h,
                  x -> CASE WHEN ((x >> bb) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
           THEN (1::BIGINT << bb) ELSE 0::BIGINT END))::BIGINT AS sh
  FROM t),
crossq AS (
  SELECT a.n * b.n AS m FROM s a JOIN s b ON a.text < b.text
  WHERE bit_count(xor(a.sh, b.sh)) <= 8),
selfq AS (SELECT n*(n-1)//2 AS m FROM s WHERE n >= 2)
SELECT (coalesce((SELECT sum(m) FROM crossq), 0)
      + coalesce((SELECT sum(m) FROM selfq), 0))::BIGINT
"""

Q46_COUNT = f"""
WITH f AS (SELECT doc_id, text FROM documents
           WHERE text LIKE '%dup%' AND length(text) >= 4),
g AS (SELECT text, count(*) AS n, min(doc_id) AS rep, {GRAMS} AS grams
      FROM f GROUP BY text),
crossq AS (
  SELECT a.n * b.n AS m
  FROM g a JOIN g b ON a.rep < b.rep
  WHERE round(len(list_intersect(a.grams, b.grams)) / len(list_distinct(a.grams || b.grams)), 6) >= 0.35),
selfq AS (SELECT n*(n-1)//2 AS m FROM g WHERE n >= 2)
SELECT (coalesce((SELECT sum(m) FROM crossq), 0)
      + coalesce((SELECT sum(m) FROM selfq), 0))::BIGINT
"""

Q47_COUNT = f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
g0 AS (SELECT label, embedding, count(*) AS n, min(vec_id) AS rep
       FROM e GROUP BY label, embedding),
g AS (SELECT label, embedding, n, rep,
        sqrt({dot('embedding', 'embedding')}) AS nrm
      FROM g0),
crossq AS (
  SELECT a.n * b.n AS m
  FROM g a JOIN g b ON a.label = b.label AND a.rep < b.rep
  WHERE round({dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) >= 0.4),
selfq AS (
  SELECT n*(n-1)//2 AS m FROM g
  WHERE round({dot('embedding', 'embedding')} / (nrm * nrm), 6) >= 0.4)
SELECT (coalesce((SELECT sum(m) FROM crossq), 0)
      + coalesce((SELECT sum(m) FROM selfq), 0))::BIGINT
"""

COUNTS = {"q44_dedup_minhash_lsh": Q44_COUNT, "q45_dedup_simhash": Q45_COUNT,
          "q46_dedup_ngram_jaccard": Q46_COUNT,
          "q47_dedup_embedding_cosine": Q47_COUNT}


def q99_linear(sf_dir, out_path):
    """Exact LINEAR reimplementation of the q99 greedy-packing recurrence
    (VERDICT r9 #3): the contract oracle is a DuckDB recursive CTE that
    iterates once per row RANK (one join per rn), so its cost grows with
    the longest per-source document chain — it dominated the x100 sweep
    wall-time. This simulates the identical recurrence in one O(n) pass:
    token counts come from the SAME DuckDB expression as the original
    (zero split-semantics drift), the fold is the CTE's CASE verbatim.
    Materializes the result to `out_path` and returns the oracle SQL that
    reads it back (column order/types matching the original).

    Unlike the q46/q47 clone-group substitutes this is exact on ANY
    corpus; equivalence is still proven vs the recursive-CTE original by
    this module's main (EXCEPT ALL both ways at sf0.01 + sf0.1)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    con = duckdb.connect()
    t = con.execute(
        "SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok "
        f"FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY source, doc_id").fetch_arrow_table()
    src = t.column("source").to_pylist()
    tok = t.column("tok").to_pylist()
    n = len(src)
    pack = [0] * n
    fill = [0] * n
    prev_src = None
    p = f = 0
    for i in range(n):
        if src[i] != prev_src:
            prev_src, p, f = src[i], 0, tok[i]
        elif f + tok[i] > 256:
            p, f = p + 1, tok[i]
        else:
            f += tok[i]
        pack[i], fill[i] = p, f
    out = pa.table({
        "source": t.column("source"),
        "doc_id": t.column("doc_id"),
        "tok": t.column("tok"),
        "pack_id": pa.array(pack, type=pa.int64()),
        "fill_after": pa.array(fill, type=pa.int64()),
    })
    pq.write_table(out, out_path)
    return (f"SELECT source, doc_id, tok, pack_id, fill_after "
            f"FROM read_parquet('{out_path}') ORDER BY source, doc_id")


# name -> materializer(sf_dir, out_path) -> oracle SQL. These substitutes
# need a computed artifact on disk (hash_check consumes SQL strings only),
# so the sweep calls the function and patches the returned SQL in.
MATERIALIZED = {"q99_greedy_packing": q99_linear}

if __name__ == "__main__":
    # equivalence proof at a feasible scale: substituted vs ORIGINAL oracle,
    # full-content EXCEPT-both-ways must be empty, counts equal
    import sys, json, time
    import duckdb
    sf = sys.argv[1]
    orig = json.load(open(sys.argv[2]))
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    ok = True
    import tempfile, os
    mat_subs = {}
    for name, fn in MATERIALIZED.items():
        if name not in orig:
            continue
        path = os.path.join(tempfile.mkdtemp(prefix="clone_oracle_"),
                            f"{name}.parquet")
        mat_subs[name] = fn(sf, path)
    for name, sub in list(SUBSTITUTED.items()) + list(mat_subs.items()):
        t0 = time.time()
        n_orig = con.execute(f"SELECT count(*) FROM ({orig[name]})").fetchone()[0]
        t1 = time.time()
        n_sub = con.execute(f"SELECT count(*) FROM ({sub})").fetchone()[0]
        t2 = time.time()
        # EXCEPT ALL (multiset difference) both ways: set-EXCEPT plus equal
        # counts does NOT prove multiset equality ({A,A,B} vs {A,B,B}
        # passes it) — ADVICE r8
        d1 = con.execute(f"SELECT count(*) FROM (({orig[name]}) EXCEPT ALL ({sub}))").fetchone()[0]
        d2 = con.execute(f"SELECT count(*) FROM (({sub}) EXCEPT ALL ({orig[name]}))").fetchone()[0]
        status = "OK" if (n_orig == n_sub and d1 == 0 and d2 == 0) else "MISMATCH"
        if status != "OK":
            ok = False
        print(f"{status} {name}: orig={n_orig} ({t1-t0:.1f}s) sub={n_sub} ({t2-t1:.1f}s) except={d1}/{d2}")
    # derived-count soundness: each COUNT substitute must equal the
    # original oracle's count(*) at a scale where the original is feasible
    for name, csql in COUNTS.items():
        if name not in orig:
            continue
        t0 = time.time()
        n_orig = con.execute(f"SELECT count(*) FROM ({orig[name]})").fetchone()[0]
        t1 = time.time()
        n_cnt = con.execute(csql).fetchone()[0]
        t2 = time.time()
        status = "OK" if n_orig == n_cnt else "MISMATCH"
        if status != "OK":
            ok = False
        print(f"{status} count:{name}: orig={n_orig} ({t1-t0:.1f}s) derived={n_cnt} ({t2-t1:.1f}s)")
    sys.exit(0 if ok else 1)
