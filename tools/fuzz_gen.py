#!/usr/bin/env python3
"""Deterministic differential-fuzz query generator.

Emits a JSON object {name: sql} of seeded-random queries written in the
ANSI subset BOTH Spark and DuckDB parse identically AND hash identically
under tools/hash_check.py's strict canonicalization. The grammar encodes
the repo's cross-engine hash-stability rules (COVERAGE.md):

- every aggregate/int output is CAST to BIGINT (DuckDB SUM(BIGINT) is
  HUGEINT, Spark's is BIGINT; int32 columns surface as int32 vs Int32);
- money doubles accumulate as DECIMAL(18,2) and output as DOUBLE
  (2-decimal by construction, so decimal accumulation is exact);
- no division, no AVG, no floats outside the decimal->double pattern;
- inner joins only (no outer-join nulls), documented FK pairs only;
- LIMIT only under a total ORDER BY; otherwise no ORDER BY is needed
  because the checker sorts rows.

Usage: python3 tools/fuzz_gen.py [seed] [count] > target/fuzz_queries.json
"""
import json
import random
import sys

# (table, unique key) and column pools by role
TABLES = {
    "region":   {"key": "r_regionkey", "ints": ["r_regionkey"],
                 "strs": ["r_name"], "money": []},
    "nation":   {"key": "n_nationkey", "ints": ["n_nationkey", "n_regionkey"],
                 "strs": ["n_name"], "money": []},
    "customer": {"key": "c_custkey", "ints": ["c_custkey", "c_nationkey"],
                 "strs": ["c_name", "c_mktsegment"], "money": ["c_acctbal"]},
    "supplier": {"key": "s_suppkey", "ints": ["s_suppkey", "s_nationkey"],
                 "strs": ["s_name"], "money": ["s_acctbal"]},
    "part":     {"key": "p_partkey", "ints": ["p_partkey", "p_size"],
                 "strs": ["p_brand", "p_type"], "money": ["p_retailprice"]},
    "orders":   {"key": "o_orderkey", "ints": ["o_orderkey", "o_custkey"],
                 "strs": ["o_orderstatus", "o_orderpriority"],
                 "money": ["o_totalprice"]},
    "lineitem": {"key": None,  # composite; never used for LIMIT ordering
                 "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
                 "strs": ["l_returnflag", "l_linestatus"],
                 "money": ["l_quantity", "l_extendedprice"]},
    "documents": {"key": "doc_id", "ints": ["doc_id", "n_chars"],
                  "strs": ["lang", "source"], "money": []},
}
# documented FK pairs for inner joins
JOINS = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]
# low-cardinality group-by columns
GROUPS = {
    "nation": ["n_regionkey"], "customer": ["c_nationkey", "c_mktsegment"],
    "supplier": ["s_nationkey"], "part": ["p_brand", "p_size", "p_type"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_returnflag", "l_linestatus", "l_linenumber"],
    "documents": ["lang", "source"],
}
STR_LITS = {
    "c_mktsegment": ["SEG_A", "SEG_B", "SEG_C"],
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
    "p_brand": ["Brand#1", "Brand#2", "Brand#3"],
    "p_type": ["TYPE_A", "TYPE_B"],
}


class Gen:
    def __init__(self, rnd):
        self.r = rnd

    def int_expr(self, t, alias=None):
        """Integer-valued expression over table t's int columns."""
        q = (alias + ".") if alias else ""
        c = q + self.r.choice(TABLES[t]["ints"])
        roll = self.r.random()
        if roll < 0.35:
            return c
        if roll < 0.5:
            return f"({c} + {self.r.randint(1, 50)})"
        if roll < 0.62:
            return f"({c} * {self.r.randint(2, 5)})"
        if roll < 0.74:
            return f"abs({c} - {self.r.randint(1, 100)})"
        if roll < 0.82:
            # NULLIF creates genuine NULLs; COALESCE collapses them back —
            # exercises both engines' NULL propagation through arithmetic
            return (f"coalesce(nullif({c}, {self.r.randint(0, 30)}), "
                    f"{self.r.randint(-5, 5)})")
        if roll < 0.9:
            return f"greatest({c}, {self.r.randint(0, 100)})"
        return (f"(CASE WHEN {c} % {self.r.randint(2, 7)} = 0 "
                f"THEN {c} ELSE {self.r.randint(0, 9)} END)")

    def str_expr(self, t, alias=None):
        q = (alias + ".") if alias else ""
        c = q + self.r.choice(TABLES[t]["strs"])
        return self.r.choice([
            c, f"upper({c})", f"lower({c})",
            f"substr({c}, 1, {self.r.randint(1, 4)})",
            f"concat({c}, '_x')",
        ])

    def pred(self, t, alias=None):
        q = (alias + ".") if alias else ""
        ps = []
        ic = q + self.r.choice(TABLES[t]["ints"])
        ps.append(f"{ic} {self.r.choice(['<', '<=', '>', '>=', '='])} "
                  f"{self.r.randint(0, 200)}")
        ps.append(f"{ic} BETWEEN {self.r.randint(0, 50)} AND {self.r.randint(51, 300)}")
        ps.append(f"{ic} % {self.r.randint(2, 9)} = {self.r.randint(0, 1)}")
        sc = self.r.choice(TABLES[t]["strs"])
        if sc in STR_LITS:
            lits = ", ".join(f"'{v}'" for v in
                             self.r.sample(STR_LITS[sc], self.r.randint(1, 2)))
            ps.append(f"{q}{sc} IN ({lits})")
            ps.append(f"{q}{sc} LIKE '{self.r.choice(STR_LITS[sc])[0]}%'")
        else:
            ps.append(f"length({q}{sc}) > {self.r.randint(2, 10)}")
            ps.append(f"{q}{sc} LIKE '%{self.r.choice('aeist')}%'")
        if TABLES[t]["money"]:
            mc = q + self.r.choice(TABLES[t]["money"])
            ps.append(f"{mc} > {self.r.randint(1, 5000)}.{self.r.randint(0, 99):02d}")
        a, b = self.r.sample(ps, 2)
        conj = self.r.choice(["AND", "OR"])
        return f"({a} {conj} {b})" if self.r.random() < 0.6 else a

    def agg_exprs(self, t, alias=None):
        """(select-list, n) of aliased aggregates — names a0..; all typed."""
        out = []
        for i in range(self.r.randint(1, 3)):
            kind = self.r.random()
            if kind < 0.3 or not TABLES[t]["money"]:
                out.append(f"CAST(COUNT(*) AS BIGINT) AS a{i}")
            elif kind < 0.55:
                e = self.int_expr(t, alias)
                out.append(f"CAST(SUM(CAST({e} AS BIGINT)) AS BIGINT) AS a{i}")
            elif kind < 0.75:
                e = self.int_expr(t, alias)
                mm = self.r.choice(["MIN", "MAX"])
                out.append(f"CAST({mm}({e}) AS BIGINT) AS a{i}")
            else:
                q = (alias + ".") if alias else ""
                mc = q + self.r.choice(TABLES[t]["money"])
                out.append("CAST(SUM(CAST(" + mc +
                           " AS DECIMAL(18,2))) AS DOUBLE) AS a" + str(i))
        # de-dup alias collisions are impossible (a0..a2); return list
        return out

    def q_filter_project(self, i):
        t = self.r.choice(list(TABLES))
        exprs = []
        for j in range(self.r.randint(1, 3)):
            e = (self.int_expr(t) if self.r.random() < 0.6 else self.str_expr(t))
            typed = (f"CAST({e} AS BIGINT)" if not any(
                s in e for s in ("upper", "lower", "substr", "concat"))
                and e.split(".")[-1] not in TABLES[t]["strs"] else e)
            exprs.append(f"{typed} AS c{j}")
        cols = ", ".join(exprs)
        ints = ", ".join(f"CAST({c} AS BIGINT) AS k_{c}" for c in TABLES[t]["ints"])
        return (f"f{i}_filter_{t}",
                f"SELECT {cols}, {ints} FROM {t} WHERE {self.pred(t)}")

    def q_agg(self, i):
        t = self.r.choice(list(GROUPS))
        g = self.r.choice(GROUPS[t])
        gexpr = f"CAST({g} AS BIGINT)" if g in TABLES[t]["ints"] else g
        aggs = ", ".join(self.agg_exprs(t))
        having = ""
        if self.r.random() < 0.3:
            having = f" HAVING COUNT(*) > {self.r.randint(1, 5)}"
        return (f"f{i}_agg_{t}",
                f"SELECT {gexpr} AS g0, {aggs} FROM {t} "
                f"WHERE {self.pred(t)} GROUP BY {gexpr}{having}")

    def q_join_agg(self, i):
        lt, lk, rt, rk = self.r.choice(JOINS)
        gt = self.r.choice([lt, rt])
        g = self.r.choice(GROUPS.get(gt, TABLES[gt]["strs"]))
        gexpr = (f"CAST({gt}.{g} AS BIGINT)" if g in TABLES[gt]["ints"]
                 else f"{gt}.{g}")
        at = self.r.choice([lt, rt])
        aggs = ", ".join(self.agg_exprs(at, at))
        w = self.pred(lt, lt) if self.r.random() < 0.5 else self.pred(rt, rt)
        return (f"f{i}_joinagg_{lt}_{rt}",
                f"SELECT {gexpr} AS g0, {aggs} FROM {lt} "
                f"JOIN {rt} ON {lt}.{lk} = {rt}.{rk} "
                f"WHERE {w} GROUP BY {gexpr}")

    def q_join_topk(self, i):
        lt, lk, rt, rk = self.r.choice(JOINS)
        e1 = self.int_expr(lt, lt)
        e2 = self.str_expr(rt, rt)
        key = TABLES[lt]["key"] or "l_orderkey"
        # ORDER BY every output column: even without a unique key, a LIMIT
        # cut among fully-identical rows returns an identical multiset —
        # synthetic lineitem has NO unique key ((l_orderkey, l_linenumber)
        # repeats), which a seed-7 run caught as a nondeterministic LIMIT
        return (f"f{i}_jointop_{lt}_{rt}",
                f"SELECT CAST({e1} AS BIGINT) AS c0, {e2} AS c1, "
                f"CAST({lt}.{key} AS BIGINT) AS ok "
                f"FROM {lt} JOIN {rt} ON {lt}.{lk} = {rt}.{rk} "
                f"WHERE {self.pred(rt, rt)} "
                f"ORDER BY c0, c1, ok LIMIT {self.r.randint(5, 50)}")

    def q_in_subquery(self, i):
        lt, lk, rt, rk = self.r.choice(JOINS)
        aggs = ", ".join(self.agg_exprs(lt))
        return (f"f{i}_insub_{lt}",
                f"SELECT {aggs} FROM {lt} WHERE {lk} IN "
                f"(SELECT {rk} FROM {rt} WHERE {self.pred(rt)})")

    def q_case_agg(self, i):
        t = self.r.choice(list(GROUPS))
        g = self.r.choice(GROUPS[t])
        gexpr = f"CAST({g} AS BIGINT)" if g in TABLES[t]["ints"] else g
        p = self.pred(t)
        return (f"f{i}_caseagg_{t}",
                f"SELECT {gexpr} AS g0, "
                f"CAST(SUM(CASE WHEN {p} THEN 1 ELSE 0 END) AS BIGINT) AS a0, "
                f"CAST(COUNT(*) AS BIGINT) AS a1 FROM {t} GROUP BY {gexpr}")

    # ---- round-5 grammar extensions: windows, set ops, rollup, exists ----

    # tables whose declared key IS unique in the synthetic data (lineitem
    # has none — (l_orderkey, l_linenumber) repeats)
    KEYED = ["region", "nation", "customer", "supplier", "part", "orders"]

    def q_window(self, i):
        t = self.r.choice(self.KEYED)
        key = TABLES[t]["key"]
        g = self.r.choice(GROUPS.get(t, TABLES[t]["strs"]))
        kind = self.r.random()
        if kind < 0.4:
            # row_number is deterministic ONLY over a total order → the key
            wf = f"ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {key})"
        elif kind < 0.7:
            # rank/dense_rank depend only on the order VALUE → any column
            oc = self.r.choice(TABLES[t]["ints"])
            fn = self.r.choice(["RANK", "DENSE_RANK"])
            wf = f"{fn}() OVER (PARTITION BY {g} ORDER BY {oc})"
        else:
            e = self.int_expr(t)
            wf = f"SUM(CAST({e} AS BIGINT)) OVER (PARTITION BY {g})"
        return (f"f{i}_window_{t}",
                f"SELECT CAST({key} AS BIGINT) AS k0, "
                f"CAST({wf} AS BIGINT) AS w0 "
                f"FROM {t} WHERE {self.pred(t)}")

    def q_setop(self, i):
        t1, t2 = self.r.sample(list(TABLES), 2)
        op = self.r.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"])
        e1 = self.int_expr(t1)
        e2 = self.int_expr(t2)
        return (f"f{i}_setop_{t1}_{t2}",
                f"SELECT CAST({e1} % 50 AS BIGINT) AS v FROM {t1} "
                f"WHERE {self.pred(t1)} {op} "
                f"SELECT CAST({e2} % 50 AS BIGINT) AS v FROM {t2} "
                f"WHERE {self.pred(t2)}")

    def q_rollup(self, i):
        t = self.r.choice(list(GROUPS))
        gs = self.r.sample(GROUPS[t], min(2, len(GROUPS[t])))
        gexprs = [f"CAST({g} AS BIGINT)" if g in TABLES[t]["ints"] else g
                  for g in gs]
        # alias every group expr: engines auto-name unaliased CASTs
        # differently (DuckDB keeps the CAST text, Spark the column name)
        sel = ", ".join(f"{e} AS g{j}" for j, e in enumerate(gexprs))
        gx = ", ".join(gexprs)
        aggs = ", ".join(self.agg_exprs(t))
        kw = self.r.choice(["ROLLUP", "CUBE"])
        # no WHERE: over an EMPTY input Spark's grouping sets return 0 rows
        # while DuckDB/Postgres emit the ()-set grand-total row — a real
        # dialect divergence this fuzzer found (documented in README known
        # divergences + DialectSpec); unfiltered base tables are non-empty,
        # so the comparison is well-defined
        return (f"f{i}_rollup_{t}",
                f"SELECT {sel}, {aggs} FROM {t} GROUP BY {kw} ({gx})")

    def q_distinct_agg(self, i):
        t = self.r.choice(list(GROUPS))
        g = self.r.choice(GROUPS[t])
        gexpr = f"CAST({g} AS BIGINT)" if g in TABLES[t]["ints"] else g
        dc = self.r.choice(TABLES[t]["ints"] + TABLES[t]["strs"])
        return (f"f{i}_distagg_{t}",
                f"SELECT {gexpr} AS g0, "
                f"CAST(COUNT(DISTINCT {dc}) AS BIGINT) AS a0, "
                f"CAST(COUNT(*) AS BIGINT) AS a1 FROM {t} GROUP BY {gexpr}")

    def q_exists(self, i):
        lt, lk, rt, rk = self.r.choice(JOINS)
        neg = self.r.choice(["EXISTS", "NOT EXISTS"])
        aggs = ", ".join(self.agg_exprs(lt))
        return (f"f{i}_exists_{lt}",
                f"SELECT {aggs} FROM {lt} WHERE {neg} "
                f"(SELECT 1 FROM {rt} WHERE {rt}.{rk} = {lt}.{lk} "
                f"AND {self.pred(rt, rt)})")

    def q_datepart(self, i):
        t, c = self.r.choice([("orders", "o_orderdate"),
                              ("lineitem", "l_shipdate")])
        fn = self.r.choice(["year", "month", "day"])
        aggs = ", ".join(self.agg_exprs(t))
        return (f"f{i}_date_{t}",
                f"SELECT CAST({fn}({c}) AS BIGINT) AS g0, {aggs} "
                f"FROM {t} WHERE {self.pred(t)} GROUP BY {fn}({c})")

    def q_scalar_sub(self, i):
        lt, lk, rt, rk = self.r.choice(JOINS)
        g = self.r.choice(GROUPS.get(lt, TABLES[lt]["strs"]))
        gexpr = f"CAST({g} AS BIGINT)" if g in TABLES[lt]["ints"] else g
        return (f"f{i}_scalarsub_{lt}",
                f"SELECT {gexpr} AS g0, CAST(COUNT(*) AS BIGINT) AS a0, "
                f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {rt} "
                f"WHERE {self.pred(rt)}) AS s0 "
                f"FROM {lt} GROUP BY {gexpr}")

    # ---- round-6 grammar extensions: the divergence zone the r5 grammar
    # avoided entirely (VERDICT r5 #7) — outer-join NULLs collapsed via
    # COALESCE, ROWS/RANGE window frames, and the string-function family ----

    def q_outer_join(self, i):
        """LEFT/FULL join along an FK with the inner side filtered, so the
        outer side genuinely produces NULL keys; every nullable output is
        COALESCE'd to a typed value (the known-safe form — bare outer-join
        NULLs in group keys are where engines' NULL-sort/typing diverge)."""
        lt, lk, rt, rk = self.r.choice(JOINS)
        rpred = self.pred(rt, "r")
        if self.r.random() < 0.5:
            # LEFT: group on the COALESCE'd right key; COUNT(r.key) counts
            # matches, COUNT(*) counts all left rows
            return (f"f{i}_leftjoin_{lt}",
                    f"SELECT CAST(coalesce(r.{rk}, -1) AS BIGINT) AS g0, "
                    f"CAST(COUNT(r.{rk}) AS BIGINT) AS a0, "
                    f"CAST(COUNT(*) AS BIGINT) AS a1 "
                    f"FROM {lt} LEFT JOIN "
                    f"(SELECT * FROM {rt} r WHERE {rpred}) r "
                    f"ON {lt}.{lk} = r.{rk} "
                    f"GROUP BY coalesce(r.{rk}, -1)")
        # FULL: both sides filtered subqueries, key = coalesce(l, r)
        lpred = self.pred(lt, "l")
        return (f"f{i}_fulljoin_{lt}",
                f"SELECT CAST(coalesce(l.{lk}, r.{rk}, -1) AS BIGINT) AS g0, "
                f"CAST(COUNT(l.{lk}) AS BIGINT) AS a0, "
                f"CAST(COUNT(r.{rk}) AS BIGINT) AS a1 "
                f"FROM (SELECT * FROM {lt} l WHERE {lpred}) l "
                f"FULL JOIN (SELECT * FROM {rt} r WHERE {rpred}) r "
                f"ON l.{lk} = r.{rk} "
                f"GROUP BY coalesce(l.{lk}, r.{rk}, -1)")

    def q_window_frame(self, i):
        """Explicit ROWS/RANGE frames. Deterministic by construction: ROWS
        frames order by the UNIQUE key (any tie would make the frame
        content engine-dependent); RANGE frames may order by any int
        column because peers are defined by VALUE, not position."""
        t = self.r.choice(self.KEYED)
        key = TABLES[t]["key"]
        g = self.r.choice(GROUPS.get(t, TABLES[t]["strs"]))
        e = self.int_expr(t)
        kind = self.r.random()
        if kind < 0.4:
            lo = self.r.randint(1, 3)
            hi = self.r.choice(["CURRENT ROW", "1 FOLLOWING"])
            wf = (f"SUM(CAST({e} AS BIGINT)) OVER (PARTITION BY {g} "
                  f"ORDER BY {key} ROWS BETWEEN {lo} PRECEDING AND {hi})")
        elif kind < 0.7:
            oc = self.r.choice(TABLES[t]["ints"])
            span = self.r.randint(1, 20)
            wf = (f"COUNT(*) OVER (PARTITION BY {g} ORDER BY {oc} "
                  f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW)")
        else:
            fn = self.r.choice(["LAG", "LEAD"])
            oc = self.r.choice(TABLES[t]["ints"])
            wf = (f"{fn}({oc}, {self.r.randint(1, 2)}, {self.r.randint(-9, 0)}) "
                  f"OVER (PARTITION BY {g} ORDER BY {key})")
        return (f"f{i}_frame_{t}",
                f"SELECT CAST({key} AS BIGINT) AS k0, CAST({wf} AS BIGINT) AS w0 "
                f"FROM {t} WHERE {self.pred(t)}")

    def q_string_fns(self, i):
        """String-function family over the documented cross-engine-safe
        subset (replace/trim/reverse/lpad/rpad/instr/substr all agree on
        these ASCII pools; no collation or locale sensitivity)."""
        t = self.r.choice(list(TABLES))
        key = TABLES[t]["key"] or TABLES[t]["ints"][0]
        c = self.r.choice(TABLES[t]["strs"])
        exprs = self.r.sample([
            f"replace({c}, '{self.r.choice('aeo_')}', '{self.r.choice('xyz')}')",
            f"reverse({c})",
            f"trim(concat(' ', {c}, ' '))",
            f"lpad({c}, {self.r.randint(3, 12)}, '{self.r.choice('*#0')}')",
            f"rpad({c}, {self.r.randint(3, 12)}, '{self.r.choice('*#0')}')",
            f"substr(concat({c}, '_tail'), {self.r.randint(1, 5)}, {self.r.randint(2, 8)})",
        ], self.r.randint(1, 3))
        sel = ", ".join(f"{e} AS s{j}" for j, e in enumerate(exprs))
        ints = (f"CAST(instr({c}, '{self.r.choice('aeist')}') AS BIGINT) AS n0, "
                f"CAST(length({c}) AS BIGINT) AS n1")
        return (f"f{i}_strfns_{t}",
                f"SELECT CAST({key} AS BIGINT) AS k0, {sel}, {ints} "
                f"FROM {t} WHERE {self.pred(t)}")

    def gen(self, i):
        return self.r.choice([
            self.q_filter_project, self.q_agg, self.q_join_agg,
            self.q_join_topk, self.q_in_subquery, self.q_case_agg,
            self.q_window, self.q_setop, self.q_rollup,
            self.q_distinct_agg, self.q_exists, self.q_datepart,
            self.q_scalar_sub, self.q_outer_join, self.q_window_frame,
            self.q_string_fns,
        ])(i)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    g = Gen(random.Random(seed))
    out = {}
    i = 0
    while len(out) < count:
        name, sql = g.gen(i)
        i += 1
        if name not in out:
            out[name] = sql
    json.dump(out, sys.stdout, indent=1)


if __name__ == "__main__":
    main()
