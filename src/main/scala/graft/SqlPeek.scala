package graft

/** Ad-hoc SQL timing probe: run one SQL statement from argv against the
  * registered tables of `SPARK_GRAFT_SF_DIR`, REPS times (default 2),
  * under the Bench noop-sink protocol (full materialization, no
  * count()-pruning of aggregate value expressions). For isolating the
  * cost of one expression shape at scale — e.g. the decimal-sum A/B that
  * exposed q1's aggregation cost at ×1000 (BASELINE §decimal sums).
  *
  * Usage: tools/run_main.sh graft.SqlPeek "SELECT sum(...) FROM lineitem"
  */
object SqlPeek {
  def main(args: Array[String]): Unit = {
    val sql = args.headOption.getOrElse(sys.error("usage: SqlPeek <sql>"))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "2").toInt
    val spark = Engine.session("local[32]")
    Engine.prepare(spark, sf)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      println(f"SQLPEEK rep=$i sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
