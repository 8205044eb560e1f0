package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two round-15 seams on the real sf0.01 corpus:
  *
  *  1. K-pass candidate partitioning ([[Pipeline.ngramCandSql]] with
  *     `pmod(hash(a.rep), K) = i`): the union of the K per-pass verified
  *     content-pair sets must equal the single-shot set EXACTLY, and the
  *     passes must be pairwise disjoint (each unordered pair's smaller
  *     rep hashes to one pass). This is what lets NgramPassRun trade one
  *     360-405 GB og300 shuffle for K og100-sized ones with zero
  *     cross-pass dedup debt.
  *
  *  2. The `graft.verify.broadcast` kill switch (ADVICE r14 #4): with the
  *     hint dropped the planner's shuffled verify must produce the same
  *     rows for q46's content pairs and for the full q44 query — the
  *     conf changes the PLAN past the broadcast ceiling, never the
  *     answer.
  */
class NgramPassSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Engine.session("local[4]").newSession()
    functions.registerAll(s)
    Engine.prepare(s, "/root/testdata/sf0.01")
    s.sql(Pipeline.ngramGroupsSpark).createOrReplaceTempView("npass_g")
    s
  }

  private def rows(sql: String): Set[Row] = spark.sql(sql).collect().toSet

  private def singleShot: Set[Row] =
    rows(Pipeline.ngramContentPairsSpark("npass_g"))

  private def passSql(k: Int, i: Int): String =
    s"""${Pipeline.ngramCandSql("npass_g", s"pmod(hash(a.rep), $k) = $i")},
       |${Pipeline.ngramVerifySql("cand", "npass_g")}""".stripMargin

  test("K=3 pass union == single-shot verified content pairs, passes disjoint") {
    val single = singleShot
    assert(single.nonEmpty, "sf0.01 must yield qualifying content pairs")
    val passes = (0 until 3).map(i => rows(passSql(3, i)))
    assert(passes.reduce(_ ++ _) === single)
    for (i <- 0 until 3; j <- i + 1 until 3)
      assert(passes(i).intersect(passes(j)).isEmpty, s"passes $i/$j overlap")
  }

  test("K=1 single pass is literally the single-shot set") {
    assert(rows(passSql(1, 0)) === singleShot)
  }

  test("broadcast kill switch: q46 content pairs identical without the hint") {
    assert(rows(Pipeline.ngramContentPairsSpark("npass_g", broadcast = false))
      === singleShot)
  }

  test("materialized px (round 16) == inline px content pairs") {
    // the production q46/q66 entries checkpoint px once instead of letting
    // Catalyst inline the CTE into both self-join sides; the relation —
    // and therefore the verified pair set — must be unchanged
    spark.sql(Pipeline.ngramPxSelectSql("npass_g"))
      .createOrReplaceTempView("npass_px")
    assert(rows(Pipeline.ngramContentPairsFromPx("npass_px", "npass_g"))
      === singleShot)
    assert(rows(Pipeline.ngramContentPairsFromPx("npass_px", "npass_g",
      broadcast = false)) === singleShot)
  }

  test("broadcast kill switch: full q44 identical under graft.verify.broadcast=false") {
    def run(): Set[Row] =
      SparkEntry.queries("q44_dedup_minhash_lsh")(spark, "/root/testdata/sf0.01")
        .collect().toSet
    val on = run()
    assert(on.nonEmpty)
    spark.conf.set(Pipeline.BroadcastVerifyConf, "false")
    try assert(run() === on)
    finally spark.conf.unset(Pipeline.BroadcastVerifyConf)
  }
}
