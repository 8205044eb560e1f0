package graft

import Engine.GraftCkptOps

/** Disk-bounded K-pass runner for q44's MinHash-LSH dedup (round 16,
  * VERDICT r15 #1). At organic ×1000 (m = 5M distinct contents) the
  * single-shot run's answer-bound shuffle volume is measured-infeasible
  * on this box: og300's run writes 24.4 GB of shuffle (peak live
  * 22.4 GB, TaskMetrics + du-sampled) and the og300→og1000 answer ratio
  * is ~11.1×, projecting ~250 GB-class scratch against ~70 GB free —
  * the same wall q46 hit at og300, so it gets the same protocol
  * (NgramPassRun, VERDICT r14 #1): partition the candidate space by the
  * SMALLER rep of each pair, `pmod(hash(a.rep), K) = i`. The predicate
  * references only the a side, so Catalyst pushes it below the banded
  * self-join; every unordered pair lands in exactly one pass (ra < rb
  * fixes which rep is hashed); per-pass DISTINCT equals global DISTINCT
  * because a pair's ra never changes. Each pass broadcast-verifies
  * (og1000's slice is a measured 4.563 GB, below the 8 GiB / m* ≈ 9.4M
  * ceiling) and dumps only qualifying (ra, rb, jacc) content pairs, so
  * per-pass scratch ≈ single-shot/K — exactly the per-executor bound a
  * 1000-node cluster enforces; K-passing is the single-box protocol for
  * the same answer, not a different algorithm.
  *
  * Usage (one JVM per pass so shuffle scratch is released between passes
  * by process exit, never by GC timing — tools/minhash_pass_sweep.sh):
  *   SPARK_GRAFT_SF_DIR=DIR tools/run_main.sh graft.MinhashPassRun pass K I CANDDIR
  *   SPARK_GRAFT_SF_DIR=DIR tools/run_main.sh graft.MinhashPassRun finish K CANDDIR OUTDIR
  * finish refuses to run unless all K pass_<i> dumps exist (a missing
  * pass must never read as an empty pass). */
object MinhashPassRun {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Engine.prepare(spark, sf)
    val t0 = System.nanoTime()
    def elapsed = f"${(System.nanoTime() - t0) / 1e9}%.1f s"

    val g = spark.sql(Pipeline.minhashGroupsSql).graftCkpt()
    g.createOrReplaceTempView("q44_g")
    println(s"MINHASH-PASS-RUN groups=${g.count()} built in $elapsed")

    args.toList match {
      case "pass" :: kS :: iS :: candDir :: Nil =>
        val (k, i) = (kS.toInt, iS.toInt)
        require(0 <= i && i < k, s"pass index $i out of range for K=$k")
        spark.sql(Pipeline.minhashSigSql).graftCkpt()
          .createOrReplaceTempView("q44_sig")
        val sql =
          s"""${Pipeline.minhashCandSql(s"pmod(hash(a.rep), $k) = $i")}
             |${Pipeline.minhashVerifySql(Pipeline.broadcastVerify(spark))}""".stripMargin
        spark.sql(sql).write.mode("overwrite").parquet(s"$candDir/pass_$i")
        val n = spark.read.parquet(s"$candDir/pass_$i").count()
        println(s"MINHASH-PASS-RUN pass $i/$k: $n verified content pairs, total $elapsed")

      case "finish" :: kS :: candDir :: outDir :: Nil =>
        val k = kS.toInt
        val missing = (0 until k).filterNot(i =>
          new java.io.File(s"$candDir/pass_$i/_SUCCESS").isFile)
        require(missing.isEmpty,
          s"finish K=$k: missing completed pass dumps ${missing.mkString(",")} under $candDir")
        val union = spark.read.parquet((0 until k).map(i => s"$candDir/pass_$i"): _*)
        val raw = union.count()
        // Passes are pair-disjoint by construction; DISTINCT is
        // belt-and-braces against a double-written pass directory, and
        // raw == distinct is the MEASURED disjointness check the og300
        // q46 provenance established as the protocol's receipt.
        union.distinct().graftCkpt().createOrReplaceTempView("q44_cpv")
        val cp = spark.table("q44_cpv").count()
        println(s"MINHASH-PASS-RUN finish: pass-row sum=$raw distinct union=$cp " +
          s"(disjoint=${raw == cp}) in $elapsed")
        val cfg = Pipeline.expandCfg(spark, sf)
        spark.sql(Pipeline.minhashExpandSql("q44_cpv", cfg))
          .write.mode("overwrite").parquet(s"$outDir/q44_dedup_minhash_lsh.parquet")
        println(s"MINHASH-PASS-RUN q44 dump done in $elapsed")

      // Pass-partitioned finish for corpora where the PRODUCTION finish is
      // itself the wall: at og1000 the global DISTINCT + ORDER BY over the
      // ~2.6B-row union is ~60-90 GB of live exchange — the same
      // answer-bound scratch the passes exist to avoid. finish-big expands
      // each pass's cross pairs independently (expansion is row-wise over
      // cp, so expand(union) = union(expand(pass_i)) ∪ selfClique, with
      // the selfClique branch emitted exactly once) and APPENDS unsorted
      // into one dump directory; no global distinct (passes are
      // pair-disjoint — MinhashPassSpec pin + the oracle slice compare's
      // n_oracle == n_dump equality measures it on the real dump, a
      // duplicate would read as extra_in_dump > 0) and no global sort
      // (every downstream check is order-independent). Rerun requires a
      // clean OUTDIR: step 0 overwrites, later steps append.
      case "finish-big" :: kS :: candDir :: outDir :: Nil =>
        val k = kS.toInt
        val missing = (0 until k).filterNot(i =>
          new java.io.File(s"$candDir/pass_$i/_SUCCESS").isFile)
        require(missing.isEmpty,
          s"finish-big K=$k: missing completed pass dumps ${missing.mkString(",")} under $candDir")
        val cfg = Pipeline.expandCfg(spark, sf)
        val out = s"$outDir/q44_dedup_minhash_lsh.parquet"
        var total = 0L
        for (i <- 0 until k) {
          spark.read.parquet(s"$candDir/pass_$i").createOrReplaceTempView(s"q44_p$i")
          val part = spark.sql(
            s"""SELECT da, db, jacc FROM (
               |${Pipeline.crossPairExpand(s"q44_p$i", "q44_g",
                   "least(ia, ib) AS da, greatest(ia, ib) AS db, jacc", ", cp.jacc", cfg)}) u""".stripMargin)
          part.write.mode(if (i == 0) "overwrite" else "append").parquet(out)
          val n = spark.read.parquet(s"$candDir/pass_$i").count()
          total += n
          println(s"MINHASH-PASS-RUN finish-big expand $i/$k: $n content pairs appended, total $elapsed")
        }
        spark.sql(
          s"""SELECT da, db, jacc FROM (
             |${Pipeline.selfCliqueExpand("q44_g",
                 "ia AS da, ib AS db, cast(1.0 AS DOUBLE) AS jacc", "", "", cfg)}) u""".stripMargin)
          .write.mode("append").parquet(out)
        val dumped = spark.read.parquet(out).count()
        println(s"MINHASH-PASS-RUN finish-big: pass-pair sum=$total dump rows=$dumped " +
          s"(expansion delta incl. clique=${dumped - total}) in $elapsed")

      // One-append-per-JVM decomposition of finish-big (round 16, learned
      // the hard way at og1000: twelve append jobs in ONE JVM accumulated
      // ~43 GB of dead shuffle files — the 5-min periodic GC has no
      // obligation to fire between jobs, so scratch release must come
      // from process exit, exactly the pass-phase rule). `expand` APPENDS
      // pass i's cross-expansion; `clique` appends the selfClique branch
      // once and prints the final dump count. The caller (sweep script)
      // cleans OUTDIR before a fresh sequence and may delete pass_<i>
      // after its expand returns — together they keep peak disk at
      // ~answer + 1 pass + 1 job's scratch.
      case "expand" :: kS :: iS :: candDir :: outDir :: Nil =>
        val (k, i) = (kS.toInt, iS.toInt)
        require(0 <= i && i < k, s"expand index $i out of range for K=$k")
        require(new java.io.File(s"$candDir/pass_$i/_SUCCESS").isFile,
          s"expand $i: missing completed pass dump under $candDir")
        val cfg = Pipeline.expandCfg(spark, sf)
        spark.read.parquet(s"$candDir/pass_$i").createOrReplaceTempView(s"q44_p$i")
        spark.sql(
          s"""SELECT da, db, jacc FROM (
             |${Pipeline.crossPairExpand(s"q44_p$i", "q44_g",
                 "least(ia, ib) AS da, greatest(ia, ib) AS db, jacc", ", cp.jacc", cfg)}) u""".stripMargin)
          .write.mode("append").parquet(s"$outDir/q44_dedup_minhash_lsh.parquet")
        println(s"MINHASH-PASS-RUN expand $i/$k appended in $elapsed")

      case "clique" :: outDir :: Nil =>
        val cfg = Pipeline.expandCfg(spark, sf)
        val out = s"$outDir/q44_dedup_minhash_lsh.parquet"
        spark.sql(
          s"""SELECT da, db, jacc FROM (
             |${Pipeline.selfCliqueExpand("q44_g",
                 "ia AS da, ib AS db, cast(1.0 AS DOUBLE) AS jacc", "", "", cfg)}) u""".stripMargin)
          .write.mode("append").parquet(out)
        println(s"MINHASH-PASS-RUN clique appended; dump rows=${spark.read.parquet(out).count()} in $elapsed")

      case other =>
        sys.error(s"usage: pass K I CANDDIR | finish K CANDDIR OUTDIR | finish-big K CANDDIR OUTDIR | expand K I CANDDIR OUTDIR | clique OUTDIR (got: $other)")
    }
    spark.stop()
  }
}
