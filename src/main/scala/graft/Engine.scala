package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Facade over SparkSession — the engine's single entry point.
  *
  * Mirrors the reference's `SessionContext` surface (sql entry, table
  * registration, function registry; see reference
  * `datafusion/core/src/execution/context/mod.rs:574` `SessionContext::sql`
  * and `:1117` `register_udf`) re-expressed Spark-first: a configured
  * `SparkSession`, temp views over the testdata parquet, and custom
  * functions injected into Spark's `FunctionRegistry`.
  *
  * Scale stance: config below is sized for local[32] testing, but nothing
  * here is local-only — shuffle partitions and AQE are the knobs a cluster
  * deploy would override via spark-submit; all query code is declarative
  * DataFrame/SQL so Catalyst/AQE re-plan at any scale.
  */
object Engine {

  /** Tables the driver generates (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def session(master: String = "local[32]"): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions) // functions + HammingJoinRewrite
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    functions.registerAll(s)
    s
  }

  /** Register every testdata table found under `sfDir` as a temp view.
    *
    * `events.parquet` stores TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; we read nanos as long (legacy conf) and rebuild a proper
    * TimestampType column by integral-dividing to micros — same truncation
    * DuckDB applies when casting timestamp_ns → timestamp, so oracles agree.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists()) {
        val df =
          if (t == "events") {
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(p)
              .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
          } else spark.read.parquet(p)
        df.createOrReplaceTempView(t)
      }
    }

  /** Idempotent per-query prep: functions + views on an arbitrary session.
    * Query lambdas in [[SparkEntry]] call this so they work on the driver's
    * own session (Verify/Bench), not just ours. Memoized per live session
    * (weak keys: a GC'd session's slot disappears instead of aliasing a new
    * session that happens to reuse its identity hash): re-reading ten
    * parquet schemas + re-analyzing the SQL-UDF shims costs ~0.3s, which
    * would otherwise be paid per query in a 91-query Verify/Bench sweep.
    */
  private val prepared =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())
  def prepare(spark: SparkSession, sfDir: String): SparkSession = {
    prepared.synchronized {
      if (prepared.get(spark) != sfDir) {
        // probe BEFORE registerAll: builder-injected sessions (GraftExtensions)
        // already resolve poly_hash, and for those the optimizer rule is also
        // already injected — appending it to extraOptimizations would run the
        // rewrite twice per optimizer pass
        val builderInjected = spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("poly_hash"))
        functions.registerAll(spark)
        registerTables(spark, sfDir)
        // builder-time extensions can't be added to a live foreign session
        // (the driver's); extraOptimizations is the live-session seam for
        // the HammingJoinRewrite rule. Idempotent.
        val em = spark.sessionState.experimentalMethods
        if (!builderInjected && !em.extraOptimizations.contains(HammingJoinRewrite))
          em.extraOptimizations = em.extraOptimizations :+ HammingJoinRewrite
        prepared.put(spark, sfDir)
        ()
      }
    }
    spark
  }

  /** Free cross-query executor state left behind by a previous contract
    * entry, so a long suite run (Verify/Bench: 119 queries, 2 reps) stays
    * at per-query steady state instead of accumulating block-manager and
    * GC pressure (round-4 bench showed late-suite queries 3–8× their
    * isolated times: tq18 5.68 s vs 1.18 s, q51 2.74 s vs 0.51 s — the
    * `localCheckpoint` blocks of q44/q45/q46/q66/q73/q74/q85/q100/q102 and
    * the q88/q95 streaming memory sinks were never released).
    *
    * Called at the START of each [[SparkEntry.queries]] invocation, never
    * after: an entry's returned DataFrame may still read its own
    * checkpoints/sink until the caller materializes it. Every entry
    * recreates its views and checkpoints on invocation
    * (`createOrReplaceTempView`), so dropping a PRIOR entry's state is
    * always safe. This is the same hygiene a long-lived 100 TB session
    * needs: caches are owned by the query that made them and released when
    * its result is consumed. */
  /** RDD ids persisted by [[ckpt]] — the ONLY ids [[reclaim]] may sweep.
    * Sweeping `getPersistentRDDs` wholesale would clobber third-party
    * caches and, worse, a previous entry's still-lazy locally-checkpointed
    * result whose lineage is already truncated (ADVICE r5). */
  private val ownedRddIds =
    java.util.Collections.synchronizedSet(new java.util.HashSet[Int]())

  /** Materialize `df` via `localCheckpoint()` and record the persisted
    * block's RDD id as graft-owned. Every checkpoint in query code goes
    * through here so reclaim can free exactly our blocks and nothing else.
    * The before/after diff of the persistent-RDD registry is safe under
    * the sequential contract harness (one query materializes at a time). */
  def ckpt(df: DataFrame, reliable: Boolean = false): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = if (reliable) df.checkpoint() else df.localCheckpoint()
    (sc.getPersistentRDDs.keySet -- before).foreach { id =>
      ownedRddIds.add(id); ()
    }
    out
  }

  /** Postfix syntax for [[ckpt]]: `df.graftCkpt()`. */
  implicit class GraftCkptOps(private val df: DataFrame) extends AnyVal {
    def graftCkpt(reliable: Boolean = false): DataFrame = ckpt(df, reliable)
  }

  def reclaim(spark: SparkSession): Unit = {
    // non-blocking: removal proceeds on the block-manager side while the
    // next query plans; a blocking wait here bills the previous query's
    // cleanup to the next query's wall clock (measured: up to seconds
    // after checkpoint-heavy entries)
    val persistent = spark.sparkContext.getPersistentRDDs
    val ids = ownedRddIds.synchronized {
      val snap = new java.util.ArrayList[Int](ownedRddIds)
      ownedRddIds.clear()
      snap
    }
    ids.forEach(id => persistent.get(id).foreach(_.unpersist(blocking = false)))
    // run-to-completion streaming results (q88/q95 memory sinks) live in
    // the per-stream CLONED session (Surface.withStatePartitions) and are
    // released when the entry's result DataFrame is dropped — nothing to
    // sweep here; dropping views on `spark` would be a no-op. The drops
    // r5 did here are retired with the clone-scoped streams.
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Dynamic-typed entry mirroring the reference Python binding
    * `greatest.run_greatest(list[list]) -> list` (reference `src/lib.rs:57-90`):
    * infer a common type over the columns (Float64-dominant, lib.rs:37-53),
    * all-null fast path (lib.rs:84-88), then the row-wise greatest.
    */
  def runGreatest(columns: Seq[Seq[Any]]): Seq[Any] =
    GreatestRunner.run(session(), columns)
}
