package graft

import Engine.GraftCkptOps

/** Round-16 audit: print the join strategies planned INSIDE the dedup
  * entries' intermediate checkpoint statements — PlanSweep/PlanPeek only
  * see each entry's final DataFrame, but the candidate joins of
  * q44/q45/q46 run in earlier `graftCkpt` statements whose strategy the
  * estimator picks from localCheckpoint stats that trace back to corpus
  * FILE bytes (blind to explodes). Run:
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.CkptJoinPeek"
  */
object CkptJoinPeek {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Engine.prepare(spark, sf)
    def joins(label: String, sql: String): Unit = {
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      val lines = plan.linesIterator.filter(_.contains("Join")).map(_.trim.take(110))
      println(s"== $label"); lines.foreach(l => println(s"   $l"))
    }
    // q44: candidate statement exactly as the entry builds it
    spark.sql(Pipeline.minhashGroupsSql).graftCkpt().createOrReplaceTempView("q44_g")
    spark.sql(Pipeline.minhashSigSql).graftCkpt().createOrReplaceTempView("q44_sig")
    joins("q44 cand+verify",
      s"""${Pipeline.minhashCandSql("")}
         |${Pipeline.minhashVerifySql(broadcast = true)}""".stripMargin)
    // q45: banded content pairs (HammingJoinRewrite target)
    spark.sql(Pipeline.simhashGroupsSql).graftCkpt().createOrReplaceTempView("q45_g")
    spark.sql(Pipeline.simhashSketchSql).graftCkpt().createOrReplaceTempView("q45_s")
    joins("q45 content pairs", Pipeline.simhashContentPairSql)
    // q46: materialized-px candidate join (post-round shape)
    spark.sql(Pipeline.ngramGroupsSpark).graftCkpt().createOrReplaceTempView("q46_g")
    spark.sql(Pipeline.ngramPxSelectSql("q46_g")).graftCkpt().createOrReplaceTempView("q46_px")
    joins("q46 cand+verify",
      Pipeline.ngramContentPairsFromPx("q46_px", "q46_g"))
    spark.stop()
  }
}
