package graft

import org.scalatest.funsuite.AnyFunSuite

/** Parameterized statements — the PREPARE / EXECUTE surface of the
  * reference planner (reference `LogicalPlan::Prepare`,
  * DF:expr/src/logical_plan/plan.rs:249-282; SQL planner
  * DF:sql/src/statement.rs:177), mapped to Spark 4's parameterized
  * `spark.sql(text, args)` API: named (`:name`) and positional (`?`)
  * markers bind ARGUMENTS AS LITERALS into the parsed plan — same text
  * re-executed with new args ≙ EXECUTE with new parameters, and a string
  * argument can never splice SQL (injection-safe by construction).
  * COVERAGE.md records the mapping; closes the last SURVEY §2.3 sub-item.
  */
class ParamSpec extends AnyFunSuite {

  lazy val spark = Engine.session("local[4]")
  private val sf = "/root/testdata/sf0.001"

  test("named parameters bind and rebind like PREPARE/EXECUTE") {
    Engine.prepare(spark, sf)
    val text = "SELECT n_name FROM nation WHERE n_regionkey = :rk ORDER BY n_name LIMIT :n"
    val r1 = spark.sql(text, Map("rk" -> 1, "n" -> 3)).collect().map(_.getString(0))
    // EXECUTE with new parameters: same statement text, new bindings
    val r2 = spark.sql(text, Map("rk" -> 2, "n" -> 2)).collect().map(_.getString(0))
    assert(r1.length == 3 && r2.length == 2)
    val direct = spark.sql(
      "SELECT n_name FROM nation WHERE n_regionkey = 1 ORDER BY n_name LIMIT 3")
      .collect().map(_.getString(0))
    assert(r1.toSeq == direct.toSeq)
    assert(r1.toSet.intersect(r2.toSet).isEmpty, "regions 1 and 2 are disjoint")
  }

  test("positional parameters bind in marker order") {
    Engine.prepare(spark, sf)
    val got = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_custkey = ? AND o_orderkey >= ? ORDER BY o_orderkey",
      Array(37, 0)).collect().map(_.getLong(0))
    val direct = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_custkey = 37 AND o_orderkey >= 0 ORDER BY o_orderkey")
      .collect().map(_.getLong(0))
    assert(got.toSeq == direct.toSeq)
  }

  test("a parameter is a typed literal, never spliced SQL") {
    val hostile = "x'; DROP TABLE nation; --"
    val got = spark.sql("SELECT :s AS v, length(:s) AS n", Map("s" -> hostile))
      .collect()(0)
    assert(got.getString(0) == hostile)
    assert(got.getInt(1) == hostile.length)
    // typed binding: a timestamp arg arrives as a timestamp, not a string
    val ts = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val t = spark.sql("SELECT year(:t) AS y", Map("t" -> ts)).collect()(0)
    assert(t.getInt(0) == 1996)
  }
}
