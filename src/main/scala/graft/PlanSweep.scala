package graft

/** Automated plan audit over the whole contract corpus: flags the plan
  * smells that matter at 100 TB — cartesian products, exchange storms,
  * and all-pairs NLJs inside the banded dedup family. Complements
  * [[PlanAudit]] (detailed formatted plans for headline queries,
  * including PushedFilters/pruning inspection).
  *
  * Run: `sbt "runMain graft.PlanSweep"` — prints one line per query and a
  * FAIL line per smell; exit code 1 if any smell found.
  */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Engine.session("local[4]")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sf).queryExecution
        val plan = qe.executedPlan.toString
        val exchanges = plan.linesIterator.count(_.contains("Exchange "))
        val cartesian = plan.contains("CartesianProduct")
        val bcastNlj = plan.contains("BroadcastNestedLoopJoin")
        val smells = Seq(
          // a cartesian product is only acceptable where the query IS a
          // cross join (q11) or a tiny broadcast probe (ANN/IVF assign)
          (cartesian && !Set("q11_cross_join").contains(name)) -> "CartesianProduct",
          (exchanges > 12) -> s"exchange storm ($exchanges)",
          // LSH-banded dedup must pair via equi-join on (band, bucket) —
          // an all-pairs nested-loop self-join here is the 100 TB killer
          // (q48 brute-force ANN is the deliberate all-pairs baseline)
          (bcastNlj && Set("q44_dedup_minhash_lsh", "q45_dedup_simhash",
            "q46_dedup_ngram_jaccard", "q47_dedup_embedding_cosine")
            .contains(name)) -> "all-pairs NLJ in banded dedup"
        ).collect { case (true, s) => s }
        val flag = if (smells.isEmpty) "ok " else { bad += 1; "BAD" }
        println(f"SWEEP $flag $name%-30s exch=$exchanges%2d" +
          (if (bcastNlj) " bnlj" else "") + smells.mkString(" [", ",", "]").replace(" []", ""))
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"SWEEP ERR $name: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
