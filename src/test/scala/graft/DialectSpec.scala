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
}
