package graft

import Engine.GraftCkptOps
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Broadcast-slice ceiling measurement (round 15, VERDICT r14 #3). The
  * q44 and q46 verify stages broadcast per-distinct-content slices (q44:
  * the (rep, h) shingle slice; q46: the full groups view with grams) —
  * the right plan on this box and on a cluster, until the built relation
  * crosses Spark's 8 GiB / 512M-row broadcast hard limit. This probe
  * measures the REAL number that ceiling is about: it builds each slice
  * exactly as the production queries do, forces the broadcast with a
  * one-row probe join (so the exchange materializes without paying the
  * candidate join), and reads `dataSize` off the BroadcastExchangeExec
  * metric. Points at og10/og30/og100/og300 give the bytes-vs-m curve
  * BASELINE extrapolates to the ceiling; past it, flip
  * `graft.verify.broadcast=false` ([[Pipeline.broadcastVerify]]).
  * Run: SPARK_GRAFT_SF_DIR=/root/scale/og100 tools/run_main.sh graft.BroadcastSliceProbe
  */
object BroadcastSliceProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Engine.prepare(spark, sf)

    def measure(label: String, sliceSql: String): Unit = {
      val t0 = System.nanoTime()
      spark.sql(sliceSql).graftCkpt().createOrReplaceTempView("slice")
      val m = spark.table("slice").count()
      // AQE wraps the exchange in a leaf BroadcastQueryStageExec that
      // plan.collect cannot see through — disable it through the whole
      // execute+measure window (the conf is read at execution time, so it
      // must stay off until after collect()); the broadcast build itself
      // is AQE-independent.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val ex = try {
        // the probe key must be NON-FOLDABLE (rand()*0 - 1 = -1, but the
        // optimizer can't constant-propagate it into a pushed filter on
        // the slice) and the output must keep every slice column, or
        // constant folding + column pruning shrink the broadcast to an
        // empty pruned relation (measured: dataSize=0) instead of the
        // full HashedRelation the production verify builds.
        val df = spark.sql(
          """SELECT /*+ BROADCAST(x) */ x.*
            |FROM (SELECT cast(rand() * 0 AS BIGINT) - 1 AS ra) probe
            |JOIN slice x ON x.rep = probe.ra""".stripMargin)
        df.collect() // forces the broadcast build; probe row matches nothing
        val plan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        if (sys.env.contains("GRAFT_PROBE_DEBUG")) println(plan.treeString)
        plan.collect { case b: BroadcastExchangeExec => b }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      val bytes = ex.map(_.metrics("dataSize").value).sum
      val rows = ex.map(_.metrics("numOutputRows").value).sum
      println(f"BROADCAST-SLICE $label sf=$sf m=$m%,d rows=$rows%,d " +
        f"dataSize=$bytes%,d bytes (${bytes / 1e9}%.3f GB, " +
        f"${if (m > 0) bytes / m else 0}%,d B/row) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // q44 verify slice: exactly the (rep, h) projection the production
    // verify broadcasts (Pipeline.scala contentPairsSpark)
    spark.sql(Pipeline.minhashGroupsSql).graftCkpt().createOrReplaceTempView("q44_g")
    spark.sql(Pipeline.minhashSigSql).graftCkpt().createOrReplaceTempView("q44_sig")
    measure("q44_sig_slice", "SELECT rep, h FROM q44_sig")

    // q46 verify side: the FULL groups view (rep, ids, grams), as joined
    // by Pipeline.ngramVerifySql
    spark.sql(Pipeline.ngramGroupsSpark).graftCkpt().createOrReplaceTempView("q46_g")
    measure("q46_groups", "SELECT * FROM q46_g")

    spark.stop()
  }
}
