package graft

/** Generic same-JVM SQL A/B: run two SQL statements from argv alternating
  * (A,B,A,B,…) REPS times each under the Bench noop-sink protocol, so the
  * box's ambient drift cancels out of the comparison (this box swings up
  * to ~10× on multi-minute windows — round-17 measurement protocol).
  * Also verifies the two statements return IDENTICAL row multisets
  * (sorted collect compare) unless SKIP_EQ=1, so a formulation A/B can't
  * silently change the answer.
  *
  * Usage: tools/run_main.sh graft.R17SqlAb "<sqlA>" "<sqlB>"
  */
object R17SqlAb {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: R17SqlAb <sqlA> <sqlB>")
    val Seq(a, b) = args.take(2).toSeq
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    Engine.prepare(spark, sf)
    if (!sys.env.get("SKIP_EQ").contains("1")) {
      val ra = spark.sql(a).collect().map(_.toString).sorted
      val rb = spark.sql(b).collect().map(_.toString).sorted
      require(ra.sameElements(rb),
        s"A/B results differ: ${ra.length} vs ${rb.length} rows; " +
          s"first diff: ${ra.zip(rb).find(p => p._1 != p._2)}")
      println(s"ABEQ identical (${ra.length} rows)")
    }
    (1 to reps).foreach { r =>
      Seq("A" -> a, "B" -> b).foreach { case (name, sql) =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        println(f"AB17 rep=$r $name ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
