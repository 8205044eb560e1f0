#!/usr/bin/env python3
"""Differential fuzzer for the window/as-of/session seam (round 12,
VERDICT r11 #5).

The general grammar (fuzz_gen.py) covers ROWS/RANGE frames but not the
three places engine semantics are subtlest and the curated corpus pins
only designed points:

 T1 IGNORE NULLS navigation — first_value / last_value / nth_value /
    lead / lag over genuinely-null columns (nullif-made), randomized
    frames, partitions and directions. Spark and DuckDB agree on the
    SEMANTICS (probed: lead(x, n) IGNORE NULLS = the n-th non-null value
    ahead on both engines) but not the SYNTAX — Spark puts IGNORE NULLS
    after the argument list (`lead(x, 1) IGNORE NULLS OVER`), DuckDB 1.0
    inside it (`lead(x, 1 IGNORE NULLS) OVER`) — so every query is a
    dual-dialect {spark, oracle} pair built from one template.

 T2 As-of joins — the q93 union+window rewrite (the shape that scales:
    one shuffle, linear work) fuzzed across direction (backward/forward),
    strictness (inclusive/exclusive), join type (left/inner), event-type
    pairs and side predicates; the DuckDB oracle is the NATIVE ASOF JOIN
    with the matching comparator (>=, >, <=, <) — an independent
    implementation of the same semantics, so a tie-break or direction bug
    in the rewrite cannot also live in the oracle.

 T3 Session windows — gap-based sessionization (lag + cumulative-sum) at
    microsecond precision with randomized gaps, strict/inclusive gap
    comparison, event filters, partition keys (per-user and per
    (user, event_type)) and per-session aggregates, incl. the q94
    merge-semantics variant (session end = last event + gap).

Every query follows the repo's cross-engine hash rules: BIGINT casts on
int outputs, money through DECIMAL(18,2)->DOUBLE, totals ordered only
under LIMIT, no floats outside the decimal pattern. Timestamps never
cross the checker — both engines reduce ts to BIGINT microseconds
in-engine (Spark unix_micros on the normalized UTC view, DuckDB
epoch_us(ts::TIMESTAMP) on the raw file — value-identical, the q94
protocol).

Usage: python3 tools/fuzz_window.py [seed] [count] > target/fuzz_window.json
Then:  tools/run_main.sh graft.FuzzVerify target/fuzz_window.json /tmp/fw_out
       python3 tools/hash_check.py /root/testdata/sf0.01 /tmp/fw_out
"""
import json
import random
import sys

ETYPES = ["click", "view", "purchase", "error", "signup"]

# (table, unique key, int cols, group cols) — keys unique in the synthetic
# data (lineitem has none, so it stays out of navigation ordering)
NAV_TABLES = {
    "orders":   ("o_orderkey", ["o_orderkey", "o_custkey"],
                 ["o_orderstatus", "o_orderpriority"]),
    "customer": ("c_custkey", ["c_custkey", "c_nationkey"],
                 ["c_nationkey", "c_mktsegment"]),
    "part":     ("p_partkey", ["p_partkey", "p_size"], ["p_brand", "p_size"]),
    "supplier": ("s_suppkey", ["s_suppkey", "s_nationkey"], ["s_nationkey"]),
    "events":   ("event_id", ["event_id", "user_id"], ["event_type", "user_id"]),
}


class Gen:
    def __init__(self, rnd):
        self.r = rnd

    # ---- T1: IGNORE NULLS navigation ----

    def q_ignore_nulls(self, i):
        r = self.r
        t, (key, ints, groups) = r.choice(list(NAV_TABLES.items()))
        g = r.choice(groups)
        # genuine NULLs: null out one residue class of an int column
        c = r.choice(ints)
        mod = r.randint(2, 5)
        nullable = (f"(CASE WHEN {c} % {mod} = {r.randint(0, mod - 1)} "
                    f"THEN NULL ELSE {c} END)")
        direction = r.choice(["ASC", "DESC"])
        order = f"{key} {direction}"
        fn = r.choice(["first_value", "last_value", "nth_value", "lead", "lag"])
        if fn in ("lead", "lag"):
            off = r.randint(1, 3)
            args = f"{nullable}, {off}" + (f", {r.randint(-9, -1)}"
                                           if r.random() < 0.4 else "")
            frame = ""  # lead/lag take no frame
        else:
            args = f"{nullable}" + (f", {r.randint(1, 3)}" if fn == "nth_value" else "")
            frame = r.choice([
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
                f" ROWS BETWEEN {r.randint(1, 4)} PRECEDING AND CURRENT ROW",
                f" ROWS BETWEEN {r.randint(1, 3)} PRECEDING AND {r.randint(0, 2)} FOLLOWING",
            ])
            # nth_value/first/last over a bounded frame is deterministic:
            # ROWS frames + the unique-key total order fix the frame content
        over = f"OVER (PARTITION BY {g} ORDER BY {order}{frame})"
        spark = f"{fn}({args}) IGNORE NULLS {over}"
        duck = f"{fn}({args} IGNORE NULLS) {over}"
        pred = f"{key} % {r.randint(2, 7)} != 0" if r.random() < 0.5 else "1 = 1"
        tmpl = (f"SELECT CAST({key} AS BIGINT) AS k0, "
                f"CAST({{WF}} AS BIGINT) AS w0 FROM {t} WHERE {pred}")
        return (f"fw{i}_ignorenulls_{fn}_{t}",
                tmpl.replace("{WF}", spark), tmpl.replace("{WF}", duck))

    # ---- T2: as-of join shapes (q93 union+window rewrite vs native ASOF) ----

    def q_asof(self, i):
        r = self.r
        ltype, rtype = r.sample(ETYPES, 2)
        backward = r.random() < 0.6
        strict = r.random() < 0.4
        inner = r.random() < 0.4
        lpred = (f"AND event_id % {r.randint(2, 5)} = 0"
                 if r.random() < 0.5 else "")
        rpred = (f"AND user_id % {r.randint(2, 4)} != {r.randint(0, 1)}"
                 if r.random() < 0.4 else "")
        vagg = r.choice(["MAX", "MIN"])
        # union+window (Spark side). Direction = sort order; strictness =
        # the tie-break between the probe row (is_probe=1) and the quote
        # row at EQUAL ts: inclusive sorts the quote first so the probe
        # sees it, strict sorts the probe first so it cannot.
        ts_dir = "ASC" if backward else "DESC"
        tie = ("is_probe" if not strict else "is_probe DESC")
        cmp_op = (">=" if backward and not strict else
                  ">" if backward else
                  "<=" if not strict else "<")
        spark = f"""WITH p AS (
  SELECT user_id, ts, CAST({vagg}(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS pval
  FROM events WHERE event_type = '{rtype}' {rpred} GROUP BY user_id, ts),
c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = '{ltype}' {lpred}),
u AS (
  SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE) AS pval, 1 AS is_probe FROM c
  UNION ALL
  SELECT user_id, ts, CAST(NULL AS BIGINT), pval, 0 FROM p),
w AS (
  SELECT event_id, user_id, is_probe,
    last_value(pval) IGNORE NULLS OVER (
      PARTITION BY user_id ORDER BY ts {ts_dir}, {tie}
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched
  FROM u)
SELECT event_id, user_id, matched
FROM w WHERE is_probe = 1{" AND matched IS NOT NULL" if inner else ""}"""
        jk = "ASOF JOIN" if inner else "ASOF LEFT JOIN"
        duck = f"""WITH p AS (
  SELECT user_id, ts::TIMESTAMP AS ts,
    CAST({vagg}(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS pval
  FROM events WHERE event_type = '{rtype}' {rpred} GROUP BY 1, 2),
c AS (
  SELECT event_id, user_id, ts::TIMESTAMP AS ts
  FROM events WHERE event_type = '{ltype}' {lpred})
SELECT c.event_id, c.user_id, p.pval AS matched
FROM c {jk} p ON c.user_id = p.user_id AND c.ts {cmp_op} p.ts"""
        kind = ("bwd" if backward else "fwd") + ("x" if strict else "i") + \
               ("_inner" if inner else "_left")
        return (f"fw{i}_asof_{kind}_{ltype}_{rtype}", spark, duck)

    # ---- T3: session windows (gap sessionization, microsecond exact) ----

    def q_session(self, i):
        r = self.r
        gap_us = r.choice([60, 300, 900, 1800, 3600, 7200]) * 1_000_000
        strict = r.random() < 0.7  # gap comparison: > (q65/q94 form) vs >=
        cmp_op = ">" if strict else ">="
        part = r.choice(["user_id", "user_id, event_type"])
        pred = r.choice(["", f"WHERE event_type IN ('{r.choice(ETYPES)}', "
                             f"'{r.choice(ETYPES)}')",
                         f"WHERE user_id % {r.randint(2, 5)} = 0"])
        # per-session aggregates; s_end exercises the q94 merge rule
        # (session end = last event + gap)
        stats = ["CAST(COUNT(*) AS BIGINT) AS n",
                 "CAST(min(us) AS BIGINT) AS s_start"]
        if r.random() < 0.6:
            stats.append(f"CAST(max(us) + {gap_us} AS BIGINT) AS s_end")
        if r.random() < 0.4:
            stats.append("CAST(COUNT(DISTINCT event_type) AS BIGINT) AS ntypes")
        having = (f" HAVING COUNT(*) >= {r.randint(2, 3)}"
                  if r.random() < 0.3 else "")
        gsel = part
        # carry user_id/event_type/event_id/us explicitly through every CTE
        # so any partition key and any stat (ntypes needs event_type) resolve
        tmpl = f"""WITH e AS (
  SELECT user_id, event_id, event_type, {{EPOCH}} AS us FROM events {pred}),
g AS (
  SELECT user_id, event_type, event_id, us,
    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w {cmp_op} {gap_us}
         THEN 1 ELSE 0 END AS st
  FROM e WINDOW w AS (PARTITION BY {part} ORDER BY us, event_id)),
s AS (
  SELECT user_id, event_type, us,
    SUM(st) OVER (PARTITION BY {part} ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g)
SELECT {gsel}, CAST(sid AS BIGINT) AS sid, {', '.join(stats)}
FROM s GROUP BY {gsel}, sid{having}"""
        spark = tmpl.replace("{EPOCH}", "unix_micros(ts)")
        duck = tmpl.replace("{EPOCH}", "epoch_us(ts::TIMESTAMP)")
        kind = f"g{gap_us // 1_000_000}{'x' if strict else 'i'}"
        return (f"fw{i}_session_{kind}_{part.count(',') + 1}k", spark, duck)

    def gen(self, i):
        return self.r.choice(
            [self.q_ignore_nulls, self.q_asof, self.q_session])(i)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    g = Gen(random.Random(seed))
    out = {}
    i = 0
    while len(out) < count:
        name, spark, duck = g.gen(i)
        i += 1
        if name not in out:
            out[name] = {"spark": spark, "oracle": duck}
    json.dump(out, sys.stdout, indent=1)


if __name__ == "__main__":
    main()
