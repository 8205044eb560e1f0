package graft

/** Long-session heap-churn probe (VERDICT r7 directive 4, carried r6 #2).
  *
  * At ×1000 (600M-row lineitem) a multi-query session runs its heavy tail
  * 3–7× slower than the same queries isolated in a fresh JVM (BASELINE
  * §×1000: q1 22 s, q65 48 s, q3 198 s in a 9-query session vs 62.7 s
  * isolated for q3). This probe makes that number reproducible and lets
  * the candidate remedies be A/B'd one env var at a time:
  *
  *   - `SPARK_GRAFT_CHURN_GC=1` — System.gc() between entries. In local
  *     mode the ContextCleaner only learns a shuffle is dead when the JVM
  *     collects its ShuffleDependency, and a 96 GB heap under low pressure
  *     can hold dead dependencies for the whole session — shuffle files
  *     pile up on disk, evicting the input parquet from the page cache
  *     (the disk-bound re-spill regime BASELINE §×1000 describes). An
  *     explicit collect after each query costs ~1 s and lets the cleaner
  *     delete them promptly. A cluster deploy gets the same effect from
  *     `spark.cleaner.periodicGC.interval` (see Engine.session knob).
  *   - `SPARK_GRAFT_OFFHEAP=48g` (+ `JVM_XMX=32g`) — move Tungsten
  *     execution memory off the GC'd heap entirely.
  *   - `JVM_OPTS="-XX:+UseParallelGC"` etc. — collector A/B.
  *
  * Modes:
  *   `session [names...]`  one JVM, run the sequence in order (default:
  *                         the 9-query round-6 shape), per-step seconds +
  *                         heap + shuffle-dir footprint.
  *   `isolated <name> [reps]`  same JVM protocol but a single query, reps
  *                         times (steady state = later reps). Run it from
  *                         a fresh JVM per query to get the isolated bar.
  *
  * Timed action mirrors graft.Bench: full noop-sink materialization.
  */
object ChurnProbe {

  /** The round-6 9-query session shape: heavy aggregates and shuffles
    * first, then the three graded queries (q1/q3/q65) re-measured in the
    * dirtied session. */
  val defaultSession: Seq[String] = Seq(
    "q1_agg", "q6_selective_filter", "tq4_order_priority", "q3_join_topk",
    "q52_token_count", "q65_sessionize",
    "q1_agg", "q3_join_topk", "q65_sessionize")

  private def heapGB: Double = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / 1e9
  }

  /** Bytes under the session's local shuffle/spill dirs — the on-disk
    * footprint whose growth evicts input parquet from the page cache. */
  private def shuffleDirGB(spark: org.apache.spark.sql.SparkSession): Double = {
    def size(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(size).sum
      else f.length()
    val conf = spark.sparkContext.getConf
    val roots = conf.getOption("spark.local.dir")
      .getOrElse(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      .split(",")
    roots.flatMap { r =>
      Option(new java.io.File(r).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-"))
    }.map(size).sum / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val gcBetween = sys.env.get("SPARK_GRAFT_CHURN_GC").contains("1")
    val (mode, rest) = args.headOption match {
      case Some(m @ ("session" | "isolated")) => (m, args.drop(1).toSeq)
      case _ => ("session", args.toSeq)
    }
    val names: Seq[String] = mode match {
      case "session" => if (rest.isEmpty) defaultSession else rest
      case "isolated" =>
        val n = rest.headOption.getOrElse(sys.error("isolated mode needs a query name"))
        val reps = rest.drop(1).headOption.map(_.toInt).getOrElse(2)
        Seq.fill(reps)(n)
    }
    val spark = Engine.session(s"local[$cpus]")
    Engine.prepare(spark, sf)
    // untimed warmup: scheduler init + parquet footers (Bench's protocol)
    Engine.tableNames.foreach(t =>
      try { spark.table(t).count(); () } catch { case _: Throwable => () })
    val t00 = System.nanoTime()
    names.zipWithIndex.foreach { case (n, i) =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sf).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CHURN mode=$mode step=$i query=$n sec=$sec%.1f " +
        f"heapGB=$heapGB%.1f shuffleGB=${shuffleDirGB(spark)}%.1f gc=$gcBetween")
      if (gcBetween) { val g0 = System.nanoTime(); System.gc()
        println(f"CHURN gc step=$i sec=${(System.nanoTime() - g0) / 1e9}%.1f " +
          f"heapGB=$heapGB%.1f") }
    }
    println(f"CHURN total sec=${(System.nanoTime() - t00) / 1e9}%.1f sf=$sf")
    spark.stop()
  }
}
