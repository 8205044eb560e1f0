#!/usr/bin/env python3
"""Collapse-first differential fuzzer (VERDICT r10 #5).

Generates dedup-family query PAIRS over `documents`: the Spark side is a
COLLAPSE-FIRST restatement (group by content -> distinct-content pair
work -> membership expansion, the exact shape Pipeline.scala's
q43/q44/q46/q47 use), the oracle side is DuckDB's NAIVE all-pairs join
over the same derived corpus. Any arithmetic slip in the membership
expansion (self-clique enumeration, cross-group least/greatest pairing,
threshold handling on the expanded rows) shows up as a hash mismatch.

The fuzz dimensions are exactly the edge shapes VERDICT r10 named:
 - all-identical groups        (txt = constant-ish transforms: lang, substr(text,1,1))
 - singleton groups            (txt = full text: all 500 sf0.01 texts are distinct)
 - empty qualifier sets        (filters that empty the corpus, or transforms
                                shorter than the gram size so the length guard
                                drops every row)
 - threshold-boundary jaccard  (tau in {1e-6, .25, .333333, .5, .999999, 1.0},
                                always applied to the ROUNDED value per the
                                oracle-determinism contract)
Both sides run the same md5-derived h32 gram hash (the Pipeline contract
primitive) so gram sets are identical across engines. tau is always > 0:
at tau = 0 the naive join admits zero-overlap pairs the postings join
cannot see by construction (same reason q46 uses 0.35, not 0).

Output: {name: {"spark": sql, "oracle": sql}} JSON on stdout.
FuzzVerify runs the "spark" member and writes the "oracle" member into
oracle_sql.json for tools/hash_check.py.

Usage: python3 tools/fuzz_dedup.py [seed] [count] > target/fuzz_dedup.json
"""
import json
import random
import sys

H32_SPARK = "cast(conv(substr(md5({s}),1,8),16,10) AS BIGINT)"
H32_DUCK = "('0x' || substr(md5({s}),1,8))::BIGINT"


class Gen:
    def __init__(self, rnd):
        self.r = rnd

    # ---- derived corpus shapes (same SQL text parses in both dialects) ----

    def corpus(self):
        """(txt_expr, where_pred, shape_tag). txt is the dedup content; the
        transform controls the group-size distribution."""
        r = self.r
        shapes = [
            # heavy collapse: few distinct values, huge groups
            (f"substr(text, 1, {r.randint(1, 3)})", "sub_tiny"),
            ("lang", "lang_const"),
            (f"concat(lang, '_', source)", "lang_src"),
            # moderate: prefix long enough to keep some variety
            (f"substr(text, {r.randint(1, 4)}, {r.randint(6, 14)})", "sub_mid"),
            (f"upper(substr(text, 1, {r.randint(4, 10)}))", "sub_upper"),
            # singleton-dominated: full text (all distinct at sf0.01)
            ("text", "full_text"),
            # one giant group + singletons
            (f"CASE WHEN doc_id % {r.randint(2, 7)} = 0 THEN 'CLONE' "
             f"ELSE text END", "mixed_clone"),
            # two clone pools + tail
            (f"CASE WHEN doc_id % 5 = 0 THEN 'A' WHEN doc_id % 5 = 1 "
             f"THEN 'B' ELSE substr(text, 1, {r.randint(8, 20)}) END",
             "two_pools"),
        ]
        txt, tag = r.choice(shapes)
        preds = [
            ("", "all"),
            (f"WHERE doc_id % {r.randint(2, 5)} = 0", "mod"),
            (f"WHERE lang IN ('en', '{r.choice(['de', 'fr', 'es', 'zh'])}')", "langs"),
            (f"WHERE n_chars > {r.randint(50, 200)}", "nchars"),
            # empty-corpus edge: sf0.01 texts top out around 553 chars
            ("WHERE length(text) > 600", "empty"),
        ]
        wpred, ptag = r.choice(preds)
        return txt, wpred, f"{tag}_{ptag}"

    # ---- T1: exact-dup membership expansion vs naive equality join ----

    def q_exact_pairs(self, i):
        txt, wpred, tag = self.corpus()
        d = f"SELECT doc_id AS id, {txt} AS txt FROM documents {wpred}".strip()
        spark = (
            f"WITH d AS ({d}),\n"
            f"g AS (SELECT min(id) AS rep, sort_array(collect_list(id)) AS ids\n"
            f"      FROM d GROUP BY txt)\n"
            f"SELECT ia AS da, ib AS db FROM g\n"
            f"LATERAL VIEW explode(ids) ta AS ia\n"
            f"LATERAL VIEW explode(ids) tb AS ib\n"
            f"WHERE ia < ib")
        oracle = (
            f"WITH d AS ({d})\n"
            f"SELECT a.id AS da, b.id AS db\n"
            f"FROM d a JOIN d b ON a.txt = b.txt AND a.id < b.id")
        return f"fd{i}_exact_{tag}", spark, oracle

    def q_exact_counts(self, i):
        """Same expansion, aggregated: per-keeper pair counts. Exercises the
        size(ids) arithmetic (m*(m-1)/2) against naive COUNT(*)."""
        txt, wpred, tag = self.corpus()
        d = f"SELECT doc_id AS id, {txt} AS txt FROM documents {wpred}".strip()
        spark = (
            f"WITH d AS ({d}),\n"
            f"g AS (SELECT min(id) AS rep, count(*) AS m FROM d GROUP BY txt)\n"
            f"SELECT rep AS keeper, CAST(m * (m - 1) / 2 AS BIGINT) AS n_pairs\n"
            f"FROM g WHERE m >= 2")
        oracle = (
            f"WITH d AS ({d}),\n"
            f"p AS (SELECT a.txt AS txt, a.id AS da\n"
            f"      FROM d a JOIN d b ON a.txt = b.txt AND a.id < b.id)\n"
            f"SELECT CAST(min(da) AS BIGINT) AS keeper, "
            f"CAST(count(*) AS BIGINT) AS n_pairs\n"
            f"FROM p GROUP BY txt")
        return f"fd{i}_cnt_{tag}", spark, oracle

    # ---- T2: n-gram jaccard collapse-first vs naive all-pairs ----

    def q_jaccard(self, i):
        r = self.r
        txt, wpred, tag = self.corpus()
        n = r.randint(2, 6)
        tau = r.choice(["0.000001", "0.1", "0.25", "0.333333", "0.5",
                        "0.75", "0.999999", "1.0"])
        block = r.random() < 0.4  # block pairs within lang
        guard = f"length({txt}) >= {n}"
        conj = "AND" if wpred else "WHERE"
        d = (f"SELECT doc_id AS id, lang, {txt} AS txt FROM documents "
             f"{wpred} {conj} {guard}").strip()
        hs = H32_SPARK.format(s=f"substr(txt, i, {n})")
        hd = H32_DUCK.format(s=f"substr(txt, i, {n})")
        bsel = "lang, " if block else ""
        bgrp = ", lang" if block else ""
        bjoin = " AND a.lang = b.lang" if block else ""
        spark = (
            f"WITH d AS ({d}),\n"
            f"g AS (SELECT {bsel}min(id) AS rep, "
            f"sort_array(collect_list(id)) AS ids,\n"
            f"  array_distinct(transform(sequence(1, length(txt) - {n - 1}),\n"
            f"    i -> {hs})) AS grams\n"
            f"  FROM d GROUP BY txt{bgrp}),\n"
            f"sz AS (SELECT rep, size(grams) AS sz FROM g),\n"
            f"x AS (SELECT {bsel}rep, explode(grams) AS gr FROM g),\n"
            f"inter AS (\n"
            f"  SELECT a.rep AS ra, b.rep AS rb, COUNT(*) AS ni\n"
            f"  FROM x a JOIN x b ON a.gr = b.gr AND a.rep < b.rep{bjoin}\n"
            f"  GROUP BY a.rep, b.rep),\n"
            f"cp AS (SELECT ra, rb, jacc FROM (\n"
            f"  SELECT ra, rb, "
            f"round(ni / cast(sa.sz + sb.sz - ni AS DOUBLE), 6) AS jacc\n"
            f"  FROM inter JOIN sz sa ON sa.rep = ra "
            f"JOIN sz sb ON sb.rep = rb) t\n"
            f"  WHERE jacc >= {tau}),\n"
            f"xc AS (SELECT least(ia, ib) AS da, greatest(ia, ib) AS db, jacc\n"
            f"  FROM cp JOIN g ga ON ga.rep = cp.ra "
            f"JOIN g gb ON gb.rep = cp.rb\n"
            f"  LATERAL VIEW explode(ga.ids) ta AS ia\n"
            f"  LATERAL VIEW explode(gb.ids) tb AS ib),\n"
            f"sp AS (SELECT ia AS da, ib AS db, cast(1.0 AS DOUBLE) AS jacc\n"
            f"  FROM g LATERAL VIEW explode(ids) ta AS ia\n"
            f"  LATERAL VIEW explode(ids) tb AS ib WHERE ia < ib)\n"
            f"SELECT da, db, jacc FROM xc\n"
            f"UNION ALL SELECT da, db, jacc FROM sp")
        jd = ("round(len(list_intersect(a.grams, b.grams)) / "
              "len(list_distinct(a.grams || b.grams)), 6)")
        oracle = (
            f"WITH d AS ({d}),\n"
            f"g AS (SELECT id, lang,\n"
            f"  list_distinct(list_transform(range(1, length(txt) - {n - 2}),\n"
            f"    i -> {hd})) AS grams\n"
            f"  FROM d)\n"
            f"SELECT a.id AS da, b.id AS db, {jd} AS jacc\n"
            f"FROM g a JOIN g b ON a.id < b.id{bjoin}\n"
            f"WHERE {jd} >= {tau}")
        return f"fd{i}_jac{n}_t{tau.replace('.', 'p')}_{tag}", spark, oracle

    # ---- T3: embedding-cosine collapse-first vs naive all-pairs ----

    def q_cosine(self, i):
        """Quantized embeddings (round to d decimals) engineer duplicate
        vectors; the Spark side groups by (label?, vector), pairs DISTINCT
        vectors, and expands memberships (self-cliques at literal 1.0 —
        valid because round(dot/(nrm*nrm), 6) of any non-zero vector with
        itself is 1.0 within an ulp). Quantized values are small integers
        in double, so every dot/norm is exact and fold order is moot; both
        sides filter nrm > 0 BEFORE pairing (Spark ANSI raises on 0/0
        where DuckDB returns NaN — excluded identically, never computed).
        The naive oracle is the q47-shape all-pairs join."""
        r = self.r
        # Duplicate engineering: slice to k leading dims, scale by m, round
        # to integers. 64-dim vectors never collide under rounding alone
        # (values are in [-0.53, 0.46], so d=0 also zeroes everything);
        # k<=3 with m in {3,5,10} yields a small value lattice with real
        # duplicate groups AND non-trivial cosines. k=64/m=2 is the
        # singleton-dominated shape. `+ 0.0` folds the -0.0 that
        # round(-0.1*m, 0) produces into 0.0 on BOTH engines — group keys
        # and printed values must not depend on the sign of zero.
        k, m = r.choice([(1, 3), (2, 3), (2, 5), (3, 3), (3, 10), (64, 2)])
        tau = r.choice(["-0.999999", "0.0", "0.25", "0.5",
                        "0.999999", "1.0"])
        block = r.random() < 0.5
        wpred = r.choice(["", f"WHERE vec_id % {r.randint(2, 4)} != 0",
                          f"WHERE vec_id < {r.randint(20, 200)}"])
        qs = (f"transform(slice(embedding, 1, {k}), "
              f"x -> round(cast(x AS DOUBLE) * {m}, 0) + 0.0)")
        qd = (f"list_transform(embedding[1:{k}], "
              f"x -> round(x::DOUBLE * {m}, 0) + 0.0)")
        dots = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                "cast(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        dotd = ("list_reduce(list_prepend(0.0::DOUBLE, "
                "list_transform(range(1, len({a}) + 1), "
                "i -> {a}[i] * {b}[i])), (acc, v) -> acc + v)")
        bsel = "label, " if block else ""
        bgrp = ", label" if block else ""
        bjoin = " AND a.label = b.label" if block else ""
        cs = (f"(round({dots.format(a='a.v', b='b.v')} / "
              f"(a.nrm * b.nrm), 6) + 0.0)")
        spark = (
            f"WITH d AS (SELECT vec_id AS id, label, {qs} AS v "
            f"FROM embeddings {wpred}),\n"
            f"g AS (SELECT {bsel}min(id) AS rep, "
            f"sort_array(collect_list(id)) AS ids, v,\n"
            f"  sqrt({dots.format(a='v', b='v')}) AS nrm\n"
            f"  FROM d GROUP BY v{bgrp}),\n"
            f"gz AS (SELECT * FROM g WHERE nrm > 0),\n"
            f"cp AS (SELECT a.rep AS ra, b.rep AS rb, {cs} AS cos_sim\n"
            f"  FROM gz a JOIN gz b ON a.rep < b.rep{bjoin}\n"
            f"  ),\n"
            f"cpq AS (SELECT * FROM cp WHERE cos_sim >= {tau}),\n"
            f"xc AS (SELECT least(ia, ib) AS da, greatest(ia, ib) AS db, "
            f"cos_sim\n"
            f"  FROM cpq JOIN gz ga ON ga.rep = cpq.ra "
            f"JOIN gz gb ON gb.rep = cpq.rb\n"
            f"  LATERAL VIEW explode(ga.ids) ta AS ia\n"
            f"  LATERAL VIEW explode(gb.ids) tb AS ib),\n"
            f"sp AS (SELECT ia AS da, ib AS db, "
            f"cast(1.0 AS DOUBLE) AS cos_sim\n"
            f"  FROM gz LATERAL VIEW explode(ids) ta AS ia\n"
            f"  LATERAL VIEW explode(ids) tb AS ib WHERE ia < ib)\n"
            f"SELECT da, db, cos_sim FROM xc\n"
            f"UNION ALL SELECT da, db, cos_sim FROM sp")
        cd = (f"(round({dotd.format(a='a.v', b='b.v')} / "
              f"(a.nrm * b.nrm), 6) + 0.0)")
        oracle = (
            f"WITH d AS (SELECT vec_id AS id, label, {qd} AS v "
            f"FROM embeddings {wpred}),\n"
            f"e AS (SELECT id, label, v, "
            f"sqrt({dotd.format(a='v', b='v')}) AS nrm FROM d),\n"
            f"ez AS (SELECT * FROM e WHERE nrm > 0)\n"
            f"SELECT a.id AS da, b.id AS db, {cd} AS cos_sim\n"
            f"FROM ez a JOIN ez b ON a.id < b.id{bjoin}\n"
            f"WHERE {cd} >= {tau}")
        tt = tau.replace('.', 'p').replace('-', 'm')
        return (f"fd{i}_cos_k{k}m{m}_t{tt}_{'blk' if block else 'all'}",
                spark, oracle)

    def gen(self, i):
        return self.r.choice([
            self.q_exact_pairs, self.q_exact_counts,
            self.q_jaccard, self.q_jaccard,  # weight toward the seam
            self.q_cosine,
        ])(i)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 46
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
