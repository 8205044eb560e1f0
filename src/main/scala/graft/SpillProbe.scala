package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spill-path probe (VERDICT r5 #3): SURVEY §4.2 trusts external sort /
  * sort-merge join / aggregation spilling to Spark's built-in operators
  * (reference `sorts/sort.rs:204` external sort, `row_hash.rs` grace agg)
  * but no gate ever exercised those paths. This probe runs the same
  * queries twice in one JVM:
  *
  *   phase A (baseline)    — default thresholds, nothing spills;
  *   phase B (constrained) — `spark.shuffle.spill.numElementsForceSpillThreshold`
  *     (the real knob UnsafeExternalSorter honors in every sort, shuffle
  *     write, and SMJ input sort) plus the SQL buffer-spill thresholds for
  *     window/SMJ buffers and `objectHashAggregate.sortBased.fallbackThreshold`
  *     (the production fallback that converts a too-large agg hash map to
  *     sort-based aggregation) forced low, so every operator takes its
  *     spill path on this 2.4M-row corpus exactly as it would under real
  *     memory pressure at 100 TB.
  *
  * PASS = per-query checksums identical across phases AND disk spill
  * metrics (TaskMetrics.diskBytesSpilled, the number the Spark UI reports)
  * strictly positive for every phase-B probe. Exit 1 otherwise.
  *
  * Run: `JVM_XMX=6g tools/run_main.sh graft.SpillProbe [sfDir]`
  */
object SpillProbe {

  private val disk = new AtomicLong(0L)
  private val mem  = new AtomicLong(0L)
  private final class SpillListener extends SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) { disk.addAndGet(m.diskBytesSpilled); mem.addAndGet(m.memoryBytesSpilled) }
    }
  }

  /** (name, sql) probes. Each returns ONE row, ONE numeric checksum that is
    * order-sensitive where ordering is the property under test. */
  private def probes(spark: SparkSession): Seq[(String, () => String)] = Seq(
    // Global total-order sort + unpartitioned window: Exchange(single) →
    // SortExec → WindowExec; rn*hash makes the checksum change if ANY row
    // lands out of order after spill-merge.
    "sort+window order" -> (() => spark.sql(
      """SELECT CAST(SUM(rn * (xxhash64(l_comment, l_orderkey, l_linenumber) % 1000003)) AS STRING) c
        |FROM (SELECT row_number() OVER (ORDER BY l_comment, l_orderkey, l_linenumber) rn,
        |             l_comment, l_orderkey, l_linenumber FROM li_x)""".stripMargin)
      .head.getString(0)),
    // Distributed range-partitioned sort, fully materialized through the
    // noop sink (the Bench.scala pattern); spill is asserted via metrics,
    // row checksum via the separate agg below.
    "distributed sort" -> (() => {
      spark.table("li_x").orderBy("l_comment", "l_orderkey", "l_linenumber")
        .write.format("noop").mode("overwrite").save()
      spark.table("li_x").agg(sum(xxhash64(col("l_comment")) % 1000003).cast("string")).head.getString(0)
    }),
    // Sort-merge join: both input sorts run under the force-spill
    // threshold, the buffered-match array under the SMJ buffer threshold.
    "sort-merge join" -> (() => spark.sql(
      """SELECT CAST(SUM((xxhash64(l_orderkey, l_linenumber, o_orderpriority) % 1000003)) AS STRING) c
        |FROM (SELECT /*+ MERGE(o) */ l.l_orderkey, l.l_linenumber, o.o_orderpriority
        |      FROM li_x l JOIN ord_x o ON l.l_orderkey = o.o_orderkey)""".stripMargin)
      .head.getString(0)),
    // HashAggregate under real memory pressure: ~2.4M wide string+long
    // groups against memory.fraction=0.05 → the UnsafeFixedWidthAggregationMap
    // cannot grow, destructs into an UnsafeKVExternalSorter, and the final
    // answer is produced by spill-merge — the exact 100 TB too-many-groups
    // path (reference grace agg, `row_hash.rs`).
    "agg hash-spill" -> (() => spark.sql(
      """SELECT CAST(SUM(xxhash64(l_comment, l_orderkey, CAST(n AS STRING), CAST(s AS STRING)) % 1000003) AS STRING) c
        |FROM (SELECT l_comment, l_orderkey, COUNT(*) n, SUM(l_quantity) s
        |      FROM li_x GROUP BY l_comment, l_orderkey)""".stripMargin)
      .head.getString(0))
  )

  private def buildSession(constrained: Boolean): SparkSession = {
    val b = SparkSession.builder()
      .master("local[8]")
      .appName(if (constrained) "graft-spill" else "graft-spill-baseline")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ, not BHJ
      .config("spark.sql.adaptive.enabled", "true")
    if (constrained) b
      // Core conf, read by UnsafeExternalSorter at task time — this is why
      // the context is rebuilt rather than spark.conf.set.
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "65536")
      .config("spark.sql.windowExec.buffer.spill.threshold", "65536")
      .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "65536")
      .config("spark.memory.fraction", "0.05")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def registerX(spark: SparkSession, sf: String): Unit = {
    Engine.registerTables(spark, sf)
    // ×4 with per-copy key offsets (the ScaleProbe multiplication scheme):
    // join/group cardinality scales with the data, not just row count.
    val li = spark.table("lineitem")
    val maxOk = li.agg(max("l_orderkey")).head.getLong(0) + 1
    li.crossJoin(spark.range(4).select(col("id").as("cp")))
      .withColumn("l_orderkey", col("l_orderkey") + col("cp") * maxOk)
      // the driver testdata carries no l_comment; synthesize a wide string
      // sort key so sorted rows are fat enough for spill to matter
      .withColumn("l_comment", expr(
        "concat_ws('-', reverse(cast(l_extendedprice as string)), l_returnflag, " +
          "l_linestatus, cast(l_shipdate as string), repeat(l_linestatus, 16))"))
      .drop("cp").createOrReplaceTempView("li_x")
    val o = spark.table("orders")
    o.crossJoin(spark.range(4).select(col("id").as("cp")))
      .withColumn("o_orderkey", col("o_orderkey") + col("cp") * maxOk)
      .drop("cp").createOrReplaceTempView("ord_x")
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    def runPhase(constrained: Boolean): Seq[(String, String, Long, Long, Double)] = {
      val spark = buildSession(constrained)
      spark.sparkContext.addSparkListener(new SpillListener)
      registerX(spark, sf)
      val out = probes(spark).map { case (name, run) =>
        disk.set(0); mem.set(0)
        val t0 = System.nanoTime()
        val sum = run()
        // listener events are posted async (the bus itself is private[spark]);
        // poll until the counters hold still instead of draining it.
        var last = -1L; var settled = 0; var waited = 0
        while (settled < 2 && waited < 3000) {
          Thread.sleep(100); waited += 100
          val cur = disk.get + mem.get
          if (cur == last) settled += 1 else { settled = 0; last = cur }
        }
        (name, sum, disk.get, mem.get, (System.nanoTime() - t0) / 1e9)
      }
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      out
    }

    val base = runPhase(constrained = false)
    val spill = runPhase(constrained = true)

    var ok = true
    base.zip(spill).foreach { case ((n, c0, d0, _, t0), (_, c1, d1, m1, t1)) =>
      val same = c0 == c1
      val spilled = d1 > 0
      if (!same || !spilled) ok = false
      println(f"SPILL $n%-18s baseline ${t0}%5.1fs disk=${d0 / 1e6}%8.1fMB | " +
        f"constrained ${t1}%5.1fs disk=${d1 / 1e6}%8.1fMB mem=${m1 / 1e6}%8.1fMB | " +
        s"checksum ${if (same) "MATCH" else s"MISMATCH $c0 vs $c1"} | " +
        s"${if (spilled) "spilled" else "NO SPILL"}")
    }
    println(if (ok) "SPILL PROBE PASS" else "SPILL PROBE FAIL")
    if (!ok) sys.exit(1)
  }
}
