package graft

import Engine.GraftCkptOps

/** Round-17 A/B: alternative formulations of the px (prefix-postings)
  * stage shared by q46/q66 — guide §2.4 (remove shuffles outright) asks
  * whether the gram-df aggregate + join can be cheaper:
  *
  *  - agg-shj  (production): xall → dfreq aggregate → SHUFFLE_HASH join →
  *    rn window by rep. The xall CTE is inlined TWICE (join left + dfreq
  *    input), but the dfreq copy collapses map-side before its exchange.
  *  - win-dfc: dfc = COUNT(*) OVER (PARTITION BY gr) — one explode, one
  *    exchange by gr, but the window adds a full SORT of the postings by
  *    gr that the hash aggregate + hash join never pay.
  *  - gr-order: drop the document-frequency order entirely and rank
  *    prefixes by the gram hash alone. STILL EXACT (the pigeonhole prefix
  *    argument holds under ANY common total order — Pipeline.scala §2),
  *    but abandons the AllPairs rare-first heuristic, so the candidate
  *    count Σ_g C(df_px(g), 2) is expected to blow up: measured here via
  *    the cand-count line so the rejection is a number, not a prior.
  *
  * Variants alternate inside one JVM per rep so ambient drift cancels.
  *   SPARK_GRAFT_SF_DIR=/root/og10 tools/run_main.sh graft.R17PxProbe
  */
object R17PxProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Engine.prepare(spark, sf)
    spark.sql(Pipeline.ngramGroupsSpark).graftCkpt().createOrReplaceTempView("pxp_g")
    val prefixLen = s"sz - cast(ceil(${Pipeline.JaccGuard} * sz) AS INT) + 1"
    val aggShj =
      s"""WITH xall AS (
         |  SELECT rep, size(grams) AS sz, explode(grams) AS gr FROM pxp_g),
         |dfreq AS (SELECT gr, COUNT(*) AS dfc FROM xall GROUP BY gr),
         |px AS (
         |  SELECT rep, sz, gr FROM (
         |    SELECT /*+ SHUFFLE_HASH(dfreq) */ xall.rep, xall.sz, xall.gr,
         |      row_number() OVER (PARTITION BY xall.rep
         |                         ORDER BY dfreq.dfc, xall.gr) AS rk
         |    FROM xall JOIN dfreq ON xall.gr = dfreq.gr) r
         |  WHERE rk <= $prefixLen)
         |SELECT rep, sz, gr FROM px""".stripMargin
    val winDfc =
      s"""WITH xall AS (
         |  SELECT rep, size(grams) AS sz, explode(grams) AS gr FROM pxp_g),
         |px AS (
         |  SELECT rep, sz, gr FROM (
         |    SELECT rep, sz, gr,
         |      row_number() OVER (PARTITION BY rep ORDER BY dfc, gr) AS rk
         |    FROM (SELECT rep, sz, gr,
         |            COUNT(*) OVER (PARTITION BY gr) AS dfc FROM xall) w) r
         |  WHERE rk <= $prefixLen)
         |SELECT rep, sz, gr FROM px""".stripMargin
    val grOrder =
      s"""WITH xall AS (
         |  SELECT rep, size(grams) AS sz, explode(grams) AS gr FROM pxp_g),
         |px AS (
         |  SELECT rep, sz, gr FROM (
         |    SELECT rep, sz, gr,
         |      row_number() OVER (PARTITION BY rep ORDER BY gr) AS rk
         |    FROM xall) r
         |  WHERE rk <= $prefixLen)
         |SELECT rep, sz, gr FROM px""".stripMargin
    val variants = Seq("agg-shj" -> aggShj, "win-dfc" -> winDfc, "gr-order" -> grOrder)
    (1 to reps).foreach { r =>
      variants.foreach { case (name, sql) =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        println(f"PX17 rep=$r $name%-9s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    // stage-3 enumeration bound per formulation: Σ_g C(df_px(g), 2) —
    // candidate rows the px self-join would shuffle (NgramCandProbe math)
    variants.foreach { case (name, sql) =>
      spark.sql(sql).createOrReplaceTempView("pxp_px")
      val cand = spark.sql(
        """SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS cand
          |FROM (SELECT gr, COUNT(*) AS c FROM pxp_px GROUP BY gr)""".stripMargin)
        .head().getLong(0)
      println(s"PX17CAND $name: $cand candidate rows")
      if (sys.env.get("PLAN_DUMP").contains("1")) {
        new java.io.File("plans/r17").mkdirs()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/r17/q46_px_statement_$name.txt"),
          spark.sql(sql).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        ()
      }
    }
    spark.stop()
  }
}
