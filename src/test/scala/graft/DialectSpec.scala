package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins of Spark SQL semantics at points where other engines diverge —
  * each found by the differential fuzzer (tools/fuzz_gen.py +
  * graft.FuzzVerify against the DuckDB oracle) and documented in
  * README "Known divergences". A pin failing on a Spark upgrade means
  * the divergence landscape changed and the docs/fuzzer must follow.
  */
class DialectSpec extends AnyFunSuite {

  lazy val spark = Engine.session("local[4]")
  private val sf = "/root/testdata/sf0.001"

  test("grouping sets over an EMPTY input yield 0 rows (DuckDB/Postgres emit the ()-set row)") {
    Engine.prepare(spark, sf)
    // fuzzer find (seed 5, f23_rollup_nation): WHERE filters everything →
    // Spark's Expand+HashAggregate produces no groups at all; engines
    // following the standard emit one grand-total row (NULL, 0) for the
    // empty grouping set. Spark's behavior is consistent across
    // ROLLUP/CUBE/GROUPING SETS, and the global aggregate (no GROUP BY)
    // still emits its one row — only grouping sets differ.
    val cube = spark.sql(
      "SELECT n_regionkey, COUNT(*) FROM nation WHERE n_nationkey > 1000 GROUP BY CUBE (n_regionkey)")
    assert(cube.count() == 0)
    val rollup = spark.sql(
      "SELECT n_regionkey, COUNT(*) FROM nation WHERE n_nationkey > 1000 GROUP BY ROLLUP (n_regionkey)")
    assert(rollup.count() == 0)
    val gsets = spark.sql(
      "SELECT n_regionkey, COUNT(*) FROM nation WHERE n_nationkey > 1000 GROUP BY GROUPING SETS ((n_regionkey), ())")
    assert(gsets.count() == 0)
    // contrast: the plain global aggregate DOES emit one row on empty input
    val global = spark.sql(
      "SELECT COUNT(*) AS c FROM nation WHERE n_nationkey > 1000").collect()
    assert(global.length == 1 && global(0).getLong(0) == 0L)
  }

  test("dayofweek is 1-based Sunday=1 (DuckDB's dayofweek is 0-based Sunday=0)") {
    // 1996-01-07 is a Sunday: Spark → 1, DuckDB → 0. Any fuzz/oracle query
    // using day-of-week must add the offset explicitly on one side.
    val r = spark.sql(
      "SELECT dayofweek(TIMESTAMP '1996-01-07 00:00:00') AS d").collect()(0)
    assert(r.getInt(0) == 1)
  }

  test("concat propagates NULL (DuckDB concat skips NULL arguments)") {
    // Spark concat is null-intolerant: any NULL argument → NULL result;
    // DuckDB concat('a', NULL) = 'a'. The corpus/fuzzer therefore never
    // feeds nullable args to concat without coalesce.
    val r = spark.sql("SELECT concat('a', CAST(NULL AS STRING)) AS c").collect()(0)
    assert(r.isNullAt(0))
  }

  test("x/0 errors under ANSI; ln(0) is NULL (DuckDB: NULL and error — both reversed)") {
    // Spark 4 defaults to ANSI SQL: integer AND double division by zero
    // raise DIVIDE_BY_ZERO, where DuckDB quietly yields NULL. The polarity
    // FLIPS for logarithms: Spark ln(0)/log10(-1) return NULL even under
    // ANSI, while DuckDB raises "cannot take logarithm of zero".
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val div = intercept[Exception](spark.sql("SELECT 1/0").collect())
    assert(div.getMessage.contains("DIVIDE_BY_ZERO"), div.getMessage.take(200))
    val ln = spark.sql("SELECT ln(0) AS a, log10(-1) AS b").collect()(0)
    assert(ln.isNullAt(0) && ln.isNullAt(1))
    // agreement corners worth pinning so a Spark upgrade can't drift
    // silently: half-up rounding and negative-index substr match DuckDB
    val ok = spark.sql(
      "SELECT round(2.5) AS r1, round(-2.5) AS r2, substr('abcdef', -2, 2) AS s").collect()(0)
    assert(ok.get(0).toString.toDouble == 3.0 && ok.get(1).toString.toDouble == -3.0)
    assert(ok.getString(2) == "ef")
  }

  test("big-decimal → DOUBLE cast rounds once (DuckDB double-rounds past 2^53 scaled units)") {
    // ×10-scale find (q1_agg sum_charge, BASELINE §x10): for a
    // DECIMAL(38,6) whose scaled integer exceeds 2^53, DuckDB casts via
    // hugeint→double (rounded) then /10^scale (rounded again) — one ulp
    // high on 27864155010.941590 — while Spark produces the correctly
    // rounded double directly. Pin Spark's single-rounding so an upgrade
    // can't silently adopt the double-rounding, and pin the contract
    // rule that makes oracles engine-portable: round money aggregates to
    // scale ≤2 BEFORE the double cast (13-digit scaled integers stay
    // exact in both engines' cast paths).
    val v = spark.sql(
      "SELECT CAST(CAST('27864155010.941590' AS DECIMAL(38,6)) AS DOUBLE) AS d").collect()(0)
    assert(java.lang.Double.doubleToLongBits(v.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(27864155010.94159d), // nearest double, 0x4219F3550E0BC430
      s"decimal→double must round once: got ${v.getDouble(0)}")
  }
}
