package graft

import Engine.GraftCkptOps

/** Round-16 A/B: join strategy for the px pipeline's postings ⋈ gram-df
  * join (guide §3.1 — pick the strategy deliberately). At sf0.1 the
  * estimator broadcasts the EXPLODED postings side (sized from the 0.6 MB
  * file, blind to the ~200× explode); at og scales it flips by estimate.
  * Candidate pinned plans: SHUFFLE_HASH(dfreq) (dict side built per
  * partition, no sort) vs MERGE (both sorted) vs estimator default.
  * Alternating reps in one JVM so ambient drift cancels. Run:
  *   SPARK_GRAFT_SF_DIR=/root/og10 sbt "runMain graft.PxJoinProbe"
  */
object PxJoinProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Engine.prepare(spark, sf)
    spark.sql(Pipeline.ngramGroupsSpark).graftCkpt().createOrReplaceTempView("pxp_g")
    def pxSql(hint: String): String =
      s"""WITH xall AS (
         |  SELECT rep, size(grams) AS sz, explode(grams) AS gr FROM pxp_g),
         |dfreq AS (SELECT gr, COUNT(*) AS dfc FROM xall GROUP BY gr),
         |px AS (
         |  SELECT rep, sz, gr FROM (
         |    SELECT $hint xall.rep, xall.sz, xall.gr,
         |      row_number() OVER (PARTITION BY xall.rep
         |                         ORDER BY dfreq.dfc, xall.gr) AS rk
         |    FROM xall JOIN dfreq ON xall.gr = dfreq.gr) r
         |  WHERE rk <= sz - cast(ceil(${Pipeline.JaccGuard} * sz) AS INT) + 1)
         |SELECT rep, sz, gr FROM px""".stripMargin
    val variants = Seq(
      "default" -> "",
      "shj-dfreq" -> "/*+ SHUFFLE_HASH(dfreq) */",
      "merge" -> "/*+ MERGE(dfreq) */")
    (1 to reps).foreach { r =>
      variants.foreach { case (name, hint) =>
        val t0 = System.nanoTime()
        spark.sql(pxSql(hint)).write.format("noop").mode("overwrite").save()
        println(f"PXPROBE rep=$r $name%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    // report the join node each variant actually planned; PLAN_DUMP=1
    // additionally writes the formatted plans under plans/r16/
    variants.foreach { case (name, hint) =>
      val qe = spark.sql(pxSql(hint)).queryExecution
      val join = qe.executedPlan.toString.linesIterator
        .find(_.contains("Join")).getOrElse("?").trim
      println(s"PXPLAN $name: ${join.take(100)}")
      if (sys.env.get("PLAN_DUMP").contains("1")) {
        new java.io.File("plans/r16").mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r16/q46_px_statement_$name.txt"),
          qe.explainString(org.apache.spark.sql.execution.FormattedMode))
        ()
      }
    }
    spark.stop()
  }
}
