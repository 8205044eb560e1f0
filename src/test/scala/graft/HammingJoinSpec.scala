package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for [[HammingJoinRewrite]]: the naive `bit_count(a ^ b) <= k`
  * join must plan as a banded equi-join (no nested loop) and return
  * exactly the nested-loop result, including duplicate-row multiplicity. */
class HammingJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("local[4]")

  private def mkTable(): Unit = {
    import spark.implicits._
    // values engineered to have near pairs at several distances, plus a
    // DUPLICATE row (id 6 == id 5's value) to pin multiplicity semantics
    Seq(
      (1L, 0x0000000000000000L), (2L, 0x0000000000000007L), // ham 3
      (3L, 0x00000000000000FFL), (4L, 0x0F0F0F0F0F0F0F0FL),
      (5L, 0x0000000000000001L), (6L, 0x0000000000000001L))
      .toDF("id", "sh").createOrReplaceTempView("hj")
  }

  private val naive =
    """SELECT a.id AS ia, b.id AS ib,
      |  cast(bit_count(a.sh ^ b.sh) AS BIGINT) AS ham
      |FROM hj a JOIN hj b ON bit_count(a.sh ^ b.sh) <= 4 AND a.id < b.id
      |ORDER BY ia, ib""".stripMargin

  test("rewrites to a banded equi-join: no nested-loop in the plan") {
    mkTable()
    val plan = spark.sql(naive).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"naive hamming join should have been banded:\n$plan")
    assert(plan.contains("Generate"), "banded plan explodes band arrays")
  }

  test("banded result equals the nested-loop result, duplicates included") {
    mkTable()
    val got = spark.sql(naive).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ground truth with the rule genuinely off: the conf kill switch is the
    // only reliable disable — the rule is builder-injected, so clearing
    // extraOptimizations would leave it active and compare the banded plan
    // against itself
    spark.conf.set(HammingJoinRewrite.EnabledConf, "false")
    val exp =
      try {
        val plan = spark.sql(naive).queryExecution.executedPlan.toString
        assert(!plan.contains("Generate"), s"kill switch must yield naive plan:\n$plan")
        spark.sql(naive).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      } finally spark.conf.set(HammingJoinRewrite.EnabledConf, "true")
    assert(got.toSeq == exp.toSeq)
    // sanity on content: (1,2) ham 3, (1,5)/(1,6) ham 1, (2,5)/(2,6) ham 2, (5,6) ham 0
    assert(got.map(t => (t._1, t._2)).toSet ==
      Set((1L, 2L), (1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L), (5L, 6L)))
  }

  test("joins with an existing equi-key are left alone") {
    mkTable()
    val q =
      """SELECT a.id FROM hj a JOIN hj b
        |ON a.sh = b.sh AND bit_count(a.sh ^ b.sh) <= 2 AND a.id < b.id""".stripMargin
    val plan = spark.sql(q).queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"equi-keyed join must not be banded:\n$plan")
    assert(spark.sql(q).collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("builder-time GraftExtensions registers functions without Engine.prepare") {
    // getOrCreate would return the shared active session (ignoring
    // withExtensions) — clear active/default to force a NEW SparkSession
    // on the same SparkContext, and restore afterwards WITHOUT close()
    // (close() would stop the JVM-wide SparkContext under every suite)
    val savedActive = SparkSession.getActiveSession
    val savedDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val fresh = SparkSession.builder().master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(savedActive.forall(_ ne fresh), "must be a NEW session")
      val r = fresh.sql(
        "SELECT greatest_ref(1, 2), gcd(12L, 18L), poly_hash('abcd')").collect()(0)
      assert(r.getInt(0) == 2 && r.getLong(1) == 6L)
      assert(r.getLong(2) == ("abcd".foldLeft(0L)((a, c) => (a * 31 + c) % 2147483647L)))
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      savedDefault.foreach(SparkSession.setDefaultSession)
      savedActive.foreach(SparkSession.setActiveSession)
    }
  }
}
