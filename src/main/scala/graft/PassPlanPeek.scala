package graft

import Engine.GraftCkptOps

/** One-off plan peek for the K-pass candidate stage: prints the physical
  * plan of a pass so the pushdown of `pmod(hash(a.rep), K) = i` below the
  * postings self-join can be confirmed (it must appear as a Filter on the
  * a-side BEFORE the join/exchange, not after the join output). */
object PassPlanPeek {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("local[4]")
    Engine.prepare(spark, sf)
    val sql = args.headOption match {
      case Some("simhash") => // the q45 K-pass (round 16): must show the
        // HammingJoinRewrite's banded join, NOT a nested-loop all-pairs —
        // the a-side subquery filter must not break the rule's pattern
        spark.sql(Pipeline.simhashGroupsSql).graftCkpt().createOrReplaceTempView("q45_g")
        spark.sql(Pipeline.simhashSketchSql).graftCkpt().createOrReplaceTempView("q45_s")
        Pipeline.simhashContentPairPassSql("pmod(hash(rep), 6) = 0")
      case Some("minhash") => // the q44 K-pass (round 16)
        spark.sql(Pipeline.minhashGroupsSql).graftCkpt().createOrReplaceTempView("q44_g")
        spark.sql(Pipeline.minhashSigSql).graftCkpt().createOrReplaceTempView("q44_sig")
        s"""${Pipeline.minhashCandSql("pmod(hash(a.rep), 9) = 0")}
           |${Pipeline.minhashVerifySql(Pipeline.broadcastVerify(spark))}""".stripMargin
      case _ =>
        spark.sql(Pipeline.ngramGroupsSpark).graftCkpt().createOrReplaceTempView("q46_g")
        s"""${Pipeline.ngramCandSql("q46_g", "pmod(hash(a.rep), 9) = 0")},
           |${Pipeline.ngramVerifySql("cand", "q46_g")}""".stripMargin
    }
    spark.sql(sql).explain("formatted")
    spark.stop()
  }
}
