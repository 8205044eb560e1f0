package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Per-process warehouse for managed tables (bucketed layouts, DDL).
    * The default `./spark-warehouse` is shared by every JVM launched from
    * the repo root, and [[Layout.resetManagedTable]] deletes a table's
    * directory before re-creating it — two concurrent graft processes
    * (e.g. Verify and PlanSweep) would clobber each other's
    * `graft_*_b64` writes mid-flight. A pid-keyed tmp dir gives each JVM
    * its own namespace; the in-memory catalog already forgets managed
    * tables at exit, so nothing ever legitimately reads another process's
    * warehouse. Override with SPARK_GRAFT_WAREHOUSE to pin a location. */
  lazy val warehouseDir: String = sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", {
    val d = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft-warehouse-${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(d)
    }))
    d.getAbsolutePath
  })

  def session(master: String = "local[32]"): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions) // functions + HammingJoinRewrite
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.warehouse.dir", warehouseDir)
      // In local mode the ContextCleaner only deletes a dead shuffle's
      // files once the JVM collects its ShuffleDependency; under a big
      // low-pressure heap that can take the whole session, so shuffle
      // files accumulate and evict the input parquet from the page cache
      // (BASELINE §×1000 suite-context tail). Spark's own periodic-GC
      // default (30min) is longer than most sessions — make it tunable.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "30min"))
    // Off-heap Tungsten memory (SPARK_GRAFT_OFFHEAP=48g): execution/agg
    // buffers move out of the GC'd heap — the long-session remedy at
    // ×1000 where 600M-row aggregate state churns a 96 GB heap (BASELINE
    // §×1000 suite-context tail). A cluster deploy sets the same two
    // confs via spark-submit; pair with a SMALLER -Xmx (JVM_XMX) so
    // total footprint stays bounded.
    val s = sys.env.get("SPARK_GRAFT_OFFHEAP").filter(_.nonEmpty)
      .fold(b) { sz =>
        b.config("spark.memory.offHeap.enabled", "true")
          .config("spark.memory.offHeap.size", sz)
      }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    wireSession(s)
  }

  /** Post-build wiring applied to every Engine-built session: the custom
    * function registry plus the [[BroadcastSemiJoinRewrite]] optimizer
    * rule. The rule goes through `experimentalMethods.extraOptimizations`
    * (the LAST optimizer batch), never builder-time `injectOptimizerRule`
    * — it must run after `RewritePredicateSubquery` has turned EXISTS into
    * a LeftSemi join, and injected rules run in an earlier batch.
    * [[prepare]] repeats the same append for foreign sessions (the
    * driver's); doing it here too guarantees a bare `Engine.session` with
    * no `prepare` call still plans the scale-safe two-phase broadcast
    * semi join by default (VERDICT r8 "what's wrong" #2). Idempotent. */
  private[graft] def wireSession(s: SparkSession): SparkSession = {
    functions.registerAll(s)
    val em = s.sessionState.experimentalMethods
    if (!em.extraOptimizations.contains(BroadcastSemiJoinRewrite))
      em.extraOptimizations = em.extraOptimizations :+ BroadcastSemiJoinRewrite
    s
  }

  /** Read `events.parquet` with a TimestampType `ts`, whatever the file's
    * physical event-time layout. The driver has shipped two layouts so far
    * (TESTDATA.md history): TIMESTAMP(NANOS), which Spark's reader only
    * admits as a raw long, and plain timestamp[us] with no timezone, which
    * surfaces as TIMESTAMP_NTZ. Hard-coding either assumption breaks —
    * loudly (analyzer error) on the batch path, or *silently* (µs values
    * long-coerced then div 1000 → windows in 1970) when a hard-coded
    * read-schema overrides the footer. So: always read with the file's own
    * schema, then normalize by what we actually got.
    */
  def readEvents(spark: SparkSession, p: String): DataFrame = {
    // harmless when ts is already a timestamp; required to admit nanos files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(p))
  }

  /** Schema-conditional `ts` normalization to session-TZ TimestampType.
    * Long = legacy nanos → integral-divide to micros (same truncation DuckDB
    * applies casting timestamp_ns → timestamp, so oracles agree). NTZ →
    * cast; the session is pinned UTC so the cast is value-identical. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                => df
  }

  /** Numeric event-time in MICROSECONDS for a raw (un-normalized) events
    * frame — the probe/test seam for quantile splits and watermark math
    * that must not care which physical layout the file has. */
  def tsMicrosCol(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000")
    case _        => unix_micros(col("ts").cast(TimestampType))
  }

  /** Expected NORMALIZED schema per table (column name → admissible Spark
    * `simpleString` types). The driver regenerates the testdata between
    * rounds and has already changed physical layouts once (events.ts:
    * TIMESTAMP(NANOS)→timestamp[us], round 7 — every query died at
    * analysis, TESTDATA.md drift history). [[auditSchema]] turns the next
    * drift into ONE readable error at prepare time instead of 123
    * cascading analyzer failures or, worse, silently wrong answers.
    * Date-ish columns admit both timestamp flavors (NTZ and LTZ coerce
    * identically against literals under the UTC session); events.ts must
    * be exactly `timestamp` — that is [[normalizeTs]]'s postcondition, so
    * a third layout it can't normalize trips the audit. */
  private val ts2 = Set("timestamp", "timestamp_ntz")
  private def one(t: String) = Set(t)
  private[graft] val expectedSchemas: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> one("int"), "r_name" -> one("string")),
    "nation" -> Seq("n_nationkey" -> one("int"), "n_name" -> one("string"),
      "n_regionkey" -> one("int")),
    "customer" -> Seq("c_custkey" -> one("bigint"), "c_name" -> one("string"),
      "c_nationkey" -> one("int"), "c_acctbal" -> one("double"),
      "c_mktsegment" -> one("string")),
    "supplier" -> Seq("s_suppkey" -> one("bigint"), "s_name" -> one("string"),
      "s_nationkey" -> one("int"), "s_acctbal" -> one("double")),
    "part" -> Seq("p_partkey" -> one("bigint"), "p_name" -> one("string"),
      "p_brand" -> one("string"), "p_type" -> one("string"),
      "p_size" -> one("int"), "p_retailprice" -> one("double")),
    "orders" -> Seq("o_orderkey" -> one("bigint"), "o_custkey" -> one("bigint"),
      "o_orderstatus" -> one("string"), "o_totalprice" -> one("double"),
      "o_orderdate" -> ts2, "o_orderpriority" -> one("string")),
    "lineitem" -> Seq("l_orderkey" -> one("bigint"), "l_partkey" -> one("bigint"),
      "l_suppkey" -> one("bigint"), "l_linenumber" -> one("int"),
      "l_quantity" -> one("double"), "l_extendedprice" -> one("double"),
      "l_discount" -> one("double"), "l_tax" -> one("double"),
      "l_returnflag" -> one("string"), "l_linestatus" -> one("string"),
      "l_shipdate" -> ts2),
    "events" -> Seq("event_id" -> one("bigint"), "ts" -> one("timestamp"),
      "user_id" -> one("bigint"), "event_type" -> one("string"),
      "value" -> one("double"), "props" -> one("string")),
    "documents" -> Seq("doc_id" -> one("bigint"), "text" -> one("string"),
      "lang" -> one("string"), "source" -> one("string"),
      "n_chars" -> one("bigint")),
    "embeddings" -> Seq("vec_id" -> one("bigint"),
      "embedding" -> one("array<float>"), "label" -> one("int")))

  /** Fail fast and readably on testdata schema drift (see
    * [[expectedSchemas]]). Returns the table's schema fingerprint. */
  private[graft] def auditSchema(t: String, df: DataFrame): String = {
    val actual = df.schema.map(f => f.name -> f.dataType.simpleString)
    expectedSchemas.get(t).foreach { exp =>
      val guidance = " — testdata was regenerated with a new physical " +
        "layout; normalize it in Engine (readEvents/normalizeTs pattern) " +
        "or update Engine.expectedSchemas after auditing every reader. " +
        "See TESTDATA.md drift history."
      if (actual.map(_._1) != exp.map(_._1))
        throw new IllegalStateException(
          s"testdata schema changed: $t columns [${exp.map(_._1).mkString(", ")}]" +
            s" -> [${actual.map(_._1).mkString(", ")}]$guidance")
      val bad = exp.zip(actual).collect {
        case ((n, ok), (_, a)) if !ok.contains(a) =>
          s"$t.$n ${ok.mkString("|")} -> $a"
      }
      if (bad.nonEmpty)
        throw new IllegalStateException(
          s"testdata schema changed: ${bad.mkString("; ")}$guidance")
    }
    java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.seqHash(actual))
  }

  /** Register every testdata table found under `sfDir` as a temp view.
    * `events` goes through [[readEvents]] (schema-conditional `ts`); every
    * table is schema-audited, and the per-table fingerprints are logged
    * once per prepare so a round artifact records what the engine saw. */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    val prints = tableNames.flatMap { t =>
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists()) {
        val df =
          if (t == "events") readEvents(spark, p)
          else spark.read.parquet(p)
        val fp = auditSchema(t, df)
        df.createOrReplaceTempView(t)
        Some(s"$t=$fp")
      } else None
    }
    System.err.println(s"[graft] $sfDir schema fingerprints: ${prints.mkString(" ")}")
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
        // ALWAYS via extraOptimizations (never injectOptimizerRule): the
        // semi-join rewrite must run in the LAST optimizer batch, after
        // RewritePredicateSubquery has turned EXISTS into a LeftSemi join
        if (!em.extraOptimizations.contains(BroadcastSemiJoinRewrite))
          em.extraOptimizations = em.extraOptimizations :+ BroadcastSemiJoinRewrite
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
