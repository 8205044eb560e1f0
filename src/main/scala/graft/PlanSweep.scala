package graft

/** Automated plan audit over the whole contract corpus: flags the plan
  * smells that matter at 100 TB — cartesian products, exchange storms,
  * and all-pairs NLJs inside the banded dedup family. Complements
  * [[PlanAudit]] (detailed formatted plans for headline queries,
  * including PushedFilters/pruning inspection).
  *
  * Exchange counts are RATCHETED per query against
  * `plan_exchanges.snapshot` (repo root): any query whose physical plan
  * gains an exchange vs the snapshot fails the gate, so a 6→11 creep on
  * one query is caught even though it stays under the global storm
  * threshold (VERDICT r5 #4 — the r5 gate only had the blunt global
  * `>12`). The ratchet applies at the default sf0.01 dir only: relative
  * file sizes legitimately flip broadcast decisions at other scales.
  *
  * Run: `sbt "runMain graft.PlanSweep"` — prints one line per query and a
  * FAIL line per smell; exit code 1 if any smell found.
  * `sbt "runMain graft.PlanSweep --update"` — rewrite the snapshot from
  * the current plans (use after an INTENTIONAL plan change, then review
  * the snapshot diff in git).
  */
object PlanSweep {
  private val defaultSf = "/root/testdata/sf0.01"
  private val snapshotPath = "plan_exchanges.snapshot"

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", defaultSf)
    val update = args.contains("--update")
    val ratchet = sf == defaultSf
    val snapshot: Map[String, Int] =
      if (new java.io.File(snapshotPath).exists())
        scala.io.Source.fromFile(snapshotPath).getLines()
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
          .map { l => val Array(n, c) = l.split("\\s+"); n -> c.toInt }.toMap
      else Map.empty
    val observed = scala.collection.mutable.Map.empty[String, Int]
    val spark = Engine.session("local[4]")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sf).queryExecution
        val plan = qe.executedPlan.toString
        val exchanges = plan.linesIterator.count(_.contains("Exchange "))
        observed(name) = exchanges
        val cartesian = plan.contains("CartesianProduct")
        val bcastNlj = plan.contains("BroadcastNestedLoopJoin")
        val smells = Seq(
          // a cartesian product is only acceptable where the query IS a
          // cross join (q11) or a tiny broadcast probe (ANN/IVF assign)
          (cartesian && !Set("q11_cross_join").contains(name)) -> "CartesianProduct",
          (exchanges > 12) -> s"exchange storm ($exchanges)",
          (ratchet && !update && snapshot.get(name).exists(exchanges > _)) ->
            s"exchange ratchet: $exchanges > snapshot ${snapshot.getOrElse(name, -1)}",
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
    if (ratchet && !update) {
      // a query the snapshot knows that no longer exists, or a new query
      // the snapshot doesn't cover, means the snapshot needs a refresh —
      // fail loudly rather than silently un-ratcheting coverage
      (snapshot.keySet -- observed.keySet).toSeq.sorted.foreach { n =>
        bad += 1; println(s"SWEEP BAD $n in snapshot but not in queries (re-run --update)")
      }
      (observed.keySet -- snapshot.keySet).toSeq.sorted.foreach { n =>
        bad += 1; println(s"SWEEP BAD $n not ratcheted (re-run --update)")
      }
      // an IMPROVEMENT should also refresh the snapshot, or the gain can
      // silently erode back to the stale ceiling
      observed.foreach { case (n, c) =>
        snapshot.get(n).filter(c < _).foreach(s =>
          println(s"SWEEP note $n improved $s -> $c (tighten with --update)"))
      }
    }
    if (update && sf == defaultSf) {
      val w = new java.io.PrintWriter(snapshotPath)
      // ASCII-only: the PrintWriter uses the platform charset, and a
      // non-ASCII dash here has already mojibake'd once (VERDICT r7 §6)
      w.println("# per-query exchange counts at sf0.01 - PlanSweep fails any increase")
      observed.toSeq.sorted.foreach { case (n, c) => w.println(s"$n $c") }
      w.close()
      println(s"SWEEP wrote ${observed.size} entries to $snapshotPath")
    }
    if (bad > 0) sys.exit(1)
  }
}
