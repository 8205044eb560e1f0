package graft

/** Prints formatted physical plans for headline queries — the scale audit:
  * PushedFilters reach the parquet scan, small dims broadcast, aggregates
  * are partial+final, partitioned reads prune, WholeStageCodegen spans are
  * wide. Run: sbt "runMain graft.PlanAudit [names...]" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q6_selective_filter", "q3_join_topk", "q5_join_multiway",
        "q44_dedup_minhash_lsh", "q48_ann_topk_brute", "q58_partitioned_write_prune",
        "q91_bucketed_join", "q93_asof_join", "q100_kmeans", "q102_ann_lsh")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
