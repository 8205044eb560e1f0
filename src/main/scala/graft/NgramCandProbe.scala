package graft

import Engine.GraftCkptOps

/** q46/q66 scratch-volume bracketing probe (VERDICT r13 #1). Runs stages
  * 1-2 of the prefix-filtered n-gram join (the linear part: gram df order
  * + prefix postings, the EXACT production SQL via
  * [[Pipeline.ngramPrefixPostingsSql]]) and counts the stage-3
  * enumeration bound WITHOUT running the join:
  *
  *   raw_pairs = Σ over prefix grams g of C(df_px(g), 2)
  *
  * — the number of (pair × shared prefix gram) rows the postings
  * self-join enumerates before the length filter and GROUP BY dedup, i.e.
  * the quantity whose shuffle materialization is the scratch wall. A
  * corpus where raw_pairs × ~24 bytes exceeds free disk cannot run the
  * full join on this box; calibration at og100 (where the full join DID
  * run: ~40-45 GB peak scratch, 1441 s) anchors the bytes/row constant.
  * Run: SPARK_GRAFT_SF_DIR=/root/scale/og300 tools/run_main.sh graft.NgramCandProbe
  */
object NgramCandProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Engine.prepare(spark, sf)
    val t0 = System.nanoTime()
    val g = spark.sql(Pipeline.ngramGroupsSpark).graftCkpt()
    g.createOrReplaceTempView("q46_g")
    val m = g.count()
    val t1 = System.nanoTime()
    // integer `div` (ADVICE r14): fractional '/' returns DOUBLE — exact
    // only to 2^53 and printed in scientific notation; div keeps the
    // count an exact BIGINT at any scale.
    val row = spark.sql(
      s"""${Pipeline.ngramPrefixPostingsSql("q46_g")}
         |SELECT sum(c) AS prefix_postings,
         |  count(*) AS prefix_grams,
         |  sum(c * (c - 1) div 2) AS raw_pairs,
         |  max(c) AS max_posting
         |FROM (SELECT gr, count(*) AS c FROM px GROUP BY gr)""".stripMargin)
      .collect()(0)
    val t2 = System.nanoTime()
    println(f"NGRAM-CAND m=$m%,d distinct texts  groups=${(t1 - t0) / 1e9}%.1f s  count=${(t2 - t1) / 1e9}%.1f s")
    println(s"NGRAM-CAND prefix_postings=${row.get(0)} prefix_grams=${row.get(1)} " +
      s"raw_pairs=${row.get(2)} max_posting=${row.get(3)}")
    // Per-pass balance histogram for the K-pass protocol (round 15,
    // VERDICT r14 #1): NgramPassRun restricts stage 3 to
    // pmod(hash(a.rep), K) = i, so pass i's enumeration is EXACTLY
    // Σ over px rows (rep, gr) with pass(rep) = i of |{b in gr's
    // postings : b.rep > rep}| — computable from px alone with one
    // window, no join. Σ over passes equals raw_pairs above (cross-check
    // printed). Run with GRAFT_NGRAM_PASS_K=9 to size K before paying
    // for a single pass.
    sys.env.get("GRAFT_NGRAM_PASS_K").map(_.toInt).foreach { k =>
      spark.sql(
        s"""${Pipeline.ngramPrefixPostingsSql("q46_g")},
           |ranked AS (
           |  SELECT rep, gr,
           |    count(*)     OVER (PARTITION BY gr) AS dfp,
           |    row_number() OVER (PARTITION BY gr ORDER BY rep) AS rk
           |  FROM px)
           |SELECT pmod(hash(rep), $k) AS pass,
           |  sum(cast(dfp - rk AS BIGINT)) AS pass_rows,
           |  count(*) AS pass_postings
           |FROM ranked GROUP BY pass ORDER BY pass""".stripMargin)
        .collect().foreach { r =>
          println(s"NGRAM-PASS k=$k pass=${r.get(0)} rows=${r.get(1)} postings=${r.get(2)}")
        }
    }
    spark.stop()
  }
}
