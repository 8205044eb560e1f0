package graft

/** Steady-state timing probe: runs the named queries N times each in one
  * session, printing per-rep wall times — separates fixed JVM/planning
  * cost from real evaluation cost. Run:
  *   sbt "runMain graft.BenchProbe q44_dedup_minhash_lsh q48_ann_topk_brute"
  *
  * Default action is `count()` — honest ONLY for queries whose cost lives
  * in aggregations/joins (Catalyst prunes unreferenced final projections
  * and drops sorts under count, so a map-heavy per-row query times as
  * little more than a row count — Bench.scala's documented pitfall).
  * Set NOOP=1 to materialize through the noop sink like `graft.Bench`
  * does, which evaluates every output column.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val noop = sys.env.get("NOOP").contains("1")
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q44_dedup_minhash_lsh", "q48_ann_topk_brute", "q46_dedup_ngram_jaccard",
      "q45_dedup_simhash", "q40_token_stats", "q49_ann_ivf", "q1_agg")
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sf)
        if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
