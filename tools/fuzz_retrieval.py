#!/usr/bin/env python3
"""Collapse-first retrieval differential fuzzer (round 11).

Round 11 rewrote BM25 scoring (q73/q74) and benchmark-contamination
detection (q84) to collapse-first form (Pipeline.scala: bm25Body /
contamination). That introduced two NEW arithmetic seams the dedup
fuzzer (tools/fuzz_dedup.py) does not touch:

 T1  clone-count-weighted BM25 globals — n_docs = SUM(cnt),
     avgdl = SUM(cnt*dl)/SUM(cnt), df(w) = SUM(cnt) over contents
     containing w — plus the BOUNDED top-K id expansion
     (slice(ids, 1, K) under a global top-K over
     (round(score,6) DESC, doc_id ASC); proof in Pipeline.scala's
     bm25Body scaladoc).
 T2  content-level contamination — grams once per distinct text,
     bench = gram union over contents with >=1 bench member,
     shared(content) identical for every train clone, linear
     train-member expansion.

The Spark side of every generated pair is the collapse-first
restatement; the oracle side is DuckDB's NAIVE per-doc statement of the
same answer. Both sides share the md5-derived h32 gram hash and the
round-then-compare score discipline (ln() may differ in the last ulp
across engines; round(score, 6) absorbs it — same contract as q73).

Fuzz dimensions (the edge shapes the rewrites' equivalence arguments
lean on):
 - clone-group structure: the corpus transforms from fuzz_dedup.Gen
   (constant-ish -> giant groups, full text -> singletons, CASE mixes)
 - bench/train splits that put BOTH kinds of members in one content
   group, all-bench contents (empty train_ids), all-train contents
 - top-K boundary: K in {1, 3, 10, 50} with slice bound == K and
   tie-heavy scores (clones share a score by construction)
 - term sets including corpus-absent words (df row missing entirely)
   and k1/b parameter variation
 - n-gram sizes 2..5 with the length guard at the boundary

Output: {name: {"spark": sql, "oracle": sql}} JSON on stdout, the
FuzzVerify pair form.

Spark eval-order hazard this fuzzer found on its first smoke run (and
that the templates must defend against): when the gram transform and the
explode over it sit in ONE inlined plan, InferFiltersFromGenerate
derives `isnotnull(gs) AND size(gs) > 0` from the Generate and pushes it
to the scan with gs's DEFINING EXPRESSION substituted — and FilterExec
then hoists IsNotNull conjuncts ahead of the user's length guard, so
`slice(ws, i, n)` evaluates on texts shorter than n (sequence(1, k<1) is
DESCENDING through 0 and slice raises INVALID_PARAMETER_VALUE.START at
start=0). The production q84 is immune because graftCkpt() materializes
the groups view, cutting the optimizer's view between transform and
explode. Inline SQL must instead make the expression TOTAL:
`sequence(1, greatest(size(ws) - (n-1), 1))` is the identity for every
row the semantic guard keeps (size >= n) and merely computes harmless
short-slice grams for rows the guard discards anyway.

Usage: python3 tools/fuzz_retrieval.py [seed] [count] > target/fuzz_retrieval.json
Loop:
  python3 tools/fuzz_retrieval.py 11 300 > target/fuzz_retrieval.json
  tools/run_main.sh graft.FuzzVerify target/fuzz_retrieval.json /tmp/fuzzr_out
  python3 tools/hash_check.py /root/testdata/sf0.01 /tmp/fuzzr_out
"""
import json
import random
import sys

from fuzz_dedup import Gen as DedupGen, H32_SPARK, H32_DUCK

# words actually frequent in the driver documents corpus + one absent
TERM_POOL = ["join", "hash", "row", "scan", "filter", "merge", "the",
             "data", "dup", "value", "table", "window", "batch",
             "column", "zz_absent_term"]


class Gen:
    def __init__(self, rnd):
        self.r = rnd
        self._char_corpus = DedupGen(rnd).corpus  # char-level dedup shapes

    def corpus(self):
        """Returns (txt_spark, txt_duck, where_pred, tag). Word-preserving
        shapes 3/4 of the time: BM25 terms and word n-grams only exist
        where the transform keeps whole words, so the char-level dedup
        shapes (substr prefixes, lang constants) mostly produce EMPTY
        results here — kept at 1/4 weight for the empty/guard edge paths
        they are good at. Word truncation has no dialect-shared spelling
        (Spark array_join/slice/split vs DuckDB array_to_string/[a:b]/
        string_split; DuckDB list slices are END-INCLUSIVE, so Spark
        slice(a, s, k) = DuckDB a[s:s+k-1]), hence the pair."""
        r = self.r
        if r.random() < 0.25:
            txt, wpred, tag = self._char_corpus()
            return txt, txt, wpred, tag
        k = r.randint(2, 9)

        def trunc_s(start, n):
            return (f"array_join(slice(split(text, ' '), {start}, {n}), ' ')")

        def trunc_d(start, n):
            return (f"array_to_string(string_split(text, ' ')"
                    f"[{start}:{start + n - 1}], ' ')")

        m = r.randint(2, 6)
        shapes = [
            # singleton-dominated: full text (all distinct at sf0.01)
            ("text", "text", "full_text"),
            # first-k-words: real collision groups of real words
            (trunc_s(1, k), trunc_d(1, k), f"w{k}"),
            # one clone pool of a short word text + distinct tail
            (f"CASE WHEN doc_id % {m} = 0 THEN {trunc_s(1, k)} ELSE text END",
             f"CASE WHEN doc_id % {m} = 0 THEN {trunc_d(1, k)} ELSE text END",
             f"mixclone_w{k}"),
            # two word-truncation pools (offset windows collide apart)
            (f"CASE WHEN doc_id % 3 = 0 THEN {trunc_s(1, k)} "
             f"ELSE {trunc_s(2, k)} END",
             f"CASE WHEN doc_id % 3 = 0 THEN {trunc_d(1, k)} "
             f"ELSE {trunc_d(2, k)} END",
             f"pools_w{k}"),
        ]
        ts, td, tag = r.choice(shapes)
        preds = [
            ("", "all"),
            (f"WHERE doc_id % {r.randint(2, 5)} = 0", "mod"),
            (f"WHERE lang IN ('en', '{r.choice(['de', 'fr', 'es', 'zh'])}')",
             "langs"),
            (f"WHERE n_chars > {r.randint(50, 200)}", "nchars"),
        ]
        wpred, ptag = r.choice(preds)
        return ts, td, f"{wpred}", f"{tag}_{ptag}"

    # ---- T1: collapse-first BM25 vs naive per-doc BM25 ----

    def q_bm25(self, i):
        r = self.r
        txt_s, txt_d, wpred, tag = self.corpus()
        nterms = r.randint(1, 4)
        terms = ", ".join(f"'{w}'" for w in r.sample(TERM_POOL, nterms))
        k1 = r.choice(["0.5", "1.2", "2.0"])
        b = r.choice(["0.0", "0.75", "1.0"])
        topk = r.choice([None, 1, 3, 10, 50])  # None = full score dump
        ds = f"SELECT doc_id AS id, {txt_s} AS txt FROM documents {wpred}".strip()
        dd = f"SELECT doc_id AS id, {txt_d} AS txt FROM documents {wpred}".strip()
        ids = ("slice(sort_array(collect_list(id)), 1, %d)" % topk
               if topk else "sort_array(collect_list(id))")
        # score expression, identical text both sides modulo the df/dl
        # sources; (k1+1) and (1-b) folded to literals so both engines
        # parse the same constants
        k1p1 = f"({k1} + 1.0)"
        omb = f"(1.0 - {b})"
        score = (f"SUM(ln((consts.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)"
                 f" * tf.tf * {k1p1}"
                 f" / (tf.tf + {k1} * ({omb} + {b} * dl.dl / consts.avgdl)))")
        tail = (f"SELECT doc_id, round(score, 6) AS bm25 FROM scored\n"
                f"ORDER BY round(score, 6) DESC, doc_id"
                + (f" LIMIT {topk}" if topk else ""))
        spark = (
            f"WITH d AS ({ds}),\n"
            f"grp AS (SELECT min(id) AS rep, count(*) AS cnt,\n"
            f"  {ids} AS ids, txt FROM d GROUP BY txt),\n"
            f"toks AS (SELECT rep, cnt, explode(split(txt, ' ')) AS w FROM grp),\n"
            f"dl AS (SELECT rep, max(cnt) AS cnt, COUNT(*) AS dl\n"
            f"  FROM toks GROUP BY rep),\n"
            f"consts AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_docs,\n"
            f"  CAST(SUM(cnt * dl) AS DOUBLE) / SUM(cnt) AS avgdl FROM dl),\n"
            # tf's max(cnt) (== the group's clone count: cnt is constant
            # per rep) is NOT redundant — df below derives the
            # clone-weighted document frequency as SUM(cnt) over tf rows
            # grouped by w (ADVICE r11: keep the derivation obvious)
            f"tf AS (SELECT rep, max(cnt) AS cnt, w, CAST(COUNT(*) AS DOUBLE) AS tf\n"
            f"  FROM toks WHERE w IN ({terms}) GROUP BY rep, w),\n"
            f"df AS (SELECT w, CAST(SUM(cnt) AS DOUBLE) AS df FROM tf GROUP BY w),\n"
            f"gsc AS (SELECT tf.rep, {score} AS score\n"
            f"  FROM tf JOIN df ON tf.w = df.w JOIN dl ON tf.rep = dl.rep\n"
            f"  CROSS JOIN consts GROUP BY tf.rep),\n"
            f"scored AS (SELECT id AS doc_id, score\n"
            f"  FROM gsc JOIN grp g ON g.rep = gsc.rep\n"
            f"  LATERAL VIEW explode(g.ids) t AS id)\n" + tail)
        oracle = (
            f"WITH d AS ({dd}),\n"
            f"toks AS (SELECT id, unnest(string_split(txt, ' ')) AS w FROM d),\n"
            f"dl AS (SELECT id, COUNT(*) AS dl FROM toks GROUP BY id),\n"
            f"consts AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,\n"
            f"  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),\n"
            f"tf AS (SELECT id, w, CAST(COUNT(*) AS DOUBLE) AS tf\n"
            f"  FROM toks WHERE w IN ({terms}) GROUP BY id, w),\n"
            f"df AS (SELECT w, CAST(COUNT(DISTINCT id) AS DOUBLE) AS df\n"
            f"  FROM tf GROUP BY w),\n"
            f"scored AS (SELECT tf.id AS doc_id, {score} AS score\n"
            f"  FROM tf JOIN df ON tf.w = df.w JOIN dl ON tf.id = dl.id\n"
            f"  CROSS JOIN consts GROUP BY tf.id)\n" + tail)
        kt = f"k{topk}" if topk else "full"
        return (f"fr{i}_bm25_{kt}_n{nterms}_k1{k1.replace('.', 'p')}"
                f"_b{b.replace('.', 'p')}_{tag}", spark, oracle)

    # ---- T2: collapse-first contamination vs naive per-doc ----

    def bench_pred(self):
        r = self.r
        preds = [
            (f"id % {r.randint(2, 7)} = {r.randint(0, 1)}", "mod"),
            ("id % 97 = 0", "mod97"),           # the q84 production split
            (f"id < {r.randint(5, 120)}", "lt"),  # contiguous bench block
            (f"id % 2 = 0 AND id < {r.randint(40, 300)}", "modlt"),
            ("id >= 0", "allbench"),             # every doc is bench
            ("id < 0", "nobench"),               # empty bench set
        ]
        return r.choice(preds)

    def q_contamination(self, i):
        r = self.r
        txt_s, txt_d, wpred, tag = self.corpus()
        n = r.randint(2, 5)
        bp, btag = self.bench_pred()
        ds = f"SELECT doc_id AS id, {txt_s} AS txt FROM documents {wpred}".strip()
        dd = f"SELECT doc_id AS id, {txt_d} AS txt FROM documents {wpred}".strip()
        hs = H32_SPARK.format(s=f"array_join(slice(ws, i, {n}), ' ')")
        hd = H32_DUCK.format(s=f"array_to_string(ws[i:i+{n - 1}], ' ')")
        spark = (
            f"WITH g AS (\n"
            f"  SELECT rep, train_ids, in_bench,\n"
            f"    array_distinct(transform(sequence(1, greatest(size(ws) - {n - 1}, 1)),\n"
            f"      i -> {hs})) AS gs\n"
            f"  FROM (\n"
            f"    SELECT min(id) AS rep,\n"
            f"      filter(sort_array(collect_list(id)), id -> NOT ({bp})) AS train_ids,\n"
            f"      exists(collect_list(id), id -> {bp}) AS in_bench,\n"
            f"      split(txt, ' ') AS ws\n"
            f"    FROM ({ds}) d0\n"
            f"    WHERE size(split(txt, ' ')) >= {n}\n"
            f"    GROUP BY txt) g0),\n"
            f"bench AS (SELECT DISTINCT g FROM (\n"
            f"  SELECT explode(gs) AS g FROM g WHERE in_bench) b),\n"
            f"shared AS (\n"
            f"  SELECT t.rep, CAST(COUNT(*) AS BIGINT) AS n_shared_grams\n"
            f"  FROM (SELECT rep, explode(gs) AS g FROM g\n"
            f"        WHERE size(train_ids) > 0) t\n"
            f"  JOIN bench ON t.g = bench.g GROUP BY t.rep)\n"
            f"SELECT id AS doc_id, n_shared_grams\n"
            f"FROM shared JOIN g ON g.rep = shared.rep\n"
            f"LATERAL VIEW explode(g.train_ids) x AS id")
        oracle = (
            f"WITH d AS ({dd}),\n"
            f"bg AS (SELECT id, unnest(list_transform(range(1, len(ws) - {n - 2}),\n"
            f"    i -> {hd})) AS g\n"
            f"  FROM (SELECT id, string_split(txt, ' ') AS ws FROM d) t\n"
            f"  WHERE len(ws) >= {n}),\n"
            f"bench AS (SELECT DISTINCT g FROM bg WHERE {bp}),\n"
            f"train AS (SELECT DISTINCT id, g FROM bg WHERE NOT ({bp}))\n"
            f"SELECT train.id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams\n"
            f"FROM train JOIN bench ON train.g = bench.g\n"
            f"GROUP BY train.id")
        return f"fr{i}_cont_g{n}_{btag}_{tag}", spark, oracle

    def gen(self, i):
        return self.r.choice([
            self.q_bm25, self.q_bm25,  # weight toward the weighted globals
            self.q_contamination, self.q_contamination,
        ])(i)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    g = Gen(random.Random(seed))
    out = {}
    i = 0
    while len(out) < count:
        name, spark, oracle = g.gen(i)
        i += 1
        if name not in out:
            out[name] = {"spark": spark, "oracle": oracle}
    json.dump(out, sys.stdout, indent=1)


if __name__ == "__main__":
    main()
