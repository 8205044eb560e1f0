package graft

import Engine.GraftCkptOps

/** Stage-decomposition timer for q45 SimHash (VERDICT r13 #2): times each
  * of the four pipeline stages separately at SPARK_GRAFT_SF_DIR so the
  * og100 185.9 s can be attributed (vote aggregation vs banded join vs
  * expansion) before deciding what to slim. Run:
  *   SPARK_GRAFT_SF_DIR=/root/scale/og100 tools/run_main.sh graft.SimhashStageProbe
  */
object SimhashStageProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Engine.prepare(spark, sf)
    def stage(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $n%,d rows")
    }
    stage("groups (q45_g)") {
      val df = spark.sql(Pipeline.simhashGroupsSql).graftCkpt()
      df.createOrReplaceTempView("q45_g"); df.count()
    }
    stage("sketch (q45_s)") {
      val df = spark.sql(Pipeline.simhashSketchSql).graftCkpt()
      df.createOrReplaceTempView("q45_s"); df.count()
    }
    if (args.contains("bands-only")) {
      // raw collision volume: the banded join's pre-filter output is
      // sum over (band, bucket) of C(c,2) UNORDERED pairs (ordered ≈ 2×)
      // — this is what the 226 s at og100 actually pays for, not the
      // vote aggregation. Integer `div` keeps it an exact BIGINT
      // (ADVICE r14: '/' is a DOUBLE, exact only to 2^53).
      spark.sql(
        """SELECT band, count(*) AS buckets, max(c) AS max_bucket,
          |  sum(c * (c - 1) div 2) AS raw_pairs
          |FROM (
          |  SELECT band, bv, count(*) AS c FROM (
          |    SELECT posexplode(%s) AS (band, bv) FROM q45_s
          |  ) GROUP BY band, bv)
          |GROUP BY band ORDER BY band""".stripMargin.format(
          HammingJoinRewrite.bandPositions(8).map(ps =>
            HammingJoinRewrite.bandValSql("sh", ps)).mkString("array(", ", ", ")")))
        .show(20, false)
      spark.stop(); return
    }
    stage("band join (q45_cp)") {
      val df = spark.sql(Pipeline.simhashContentPairSql).graftCkpt()
      df.createOrReplaceTempView("q45_cp"); df.count()
    }
    stage("expand") {
      spark.sql(Pipeline.simhashExpandSql(Pipeline.expandCfg(spark, sf)))
        .write.format("noop").mode("overwrite").save()
      -1L
    }
    spark.stop()
  }
}
