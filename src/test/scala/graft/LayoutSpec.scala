package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the [[Layout]] bucketed-layout API: one file per bucket,
  * co-located zero-Exchange joins, memoized reuse, and content-fingerprint
  * invalidation when the source is rewritten. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = Engine.session("local[4]")
  private val sf = "/root/testdata/sf0.001"

  test("bucketedView: one file per bucket, sorted, co-located join has no key Exchange") {
    Engine.prepare(spark, sf)
    val o = Layout.bucketedView(spark, sf, "orders", "o_orderkey", buckets = 4)
    val l = Layout.bucketedView(spark, sf, "lineitem", "l_orderkey", buckets = 4)
    // layout: exactly `buckets` data files (repartition before bucketBy
    // puts each bucket in ONE file — the trusted-sort precondition)
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      Layout.tableName("orders", "o_orderkey", 4))
    val dataFiles = loc.listFiles.filter(_.getName.endsWith(".parquet"))
    assert(dataFiles.length == 4,
      s"expected 4 bucket files, got ${dataFiles.map(_.getName).toSeq}")
    // co-located join: SMJ, no hash-partition Exchange on either key
    val j = o.join(l.hint("merge"), o("o_orderkey") === l("l_orderkey"))
      .groupBy(o("o_orderkey")).agg(count(lit(1)).as("n"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("hashpartitioning(o_orderkey") &&
      !plan.contains("hashpartitioning(l_orderkey"),
      s"bucketed join must not shuffle the join key:\n$plan")
    // rows match the plain-table join
    val plain = Queries.T(spark, sf, "orders").join(
        Queries.T(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    assert(j.collect().map(_.mkString("|")).sorted.toSeq ==
      plain.collect().map(_.mkString("|")).sorted.toSeq)
  }

  test("bucketedView memoizes per content fingerprint and rebuilds on rewrite") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toFile
    Queries.T(spark, sf, "nation").write.parquet(s"$tmp/nation.parquet")
    Layout.bucketedView(spark, tmp.getAbsolutePath, "nation", "n_nationkey", 2)
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      Layout.tableName("nation", "n_nationkey", 2))
    def sig(): Seq[String] = loc.listFiles
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").sorted.toSeq
    val first = sig()
    // unchanged source → reuse (no rewrite of the layout)
    Layout.bucketedView(spark, tmp.getAbsolutePath, "nation", "n_nationkey", 2)
    assert(sig() == first, "unchanged source must reuse the bucketed layout")
    // rewritten source (different content) → fingerprint differs → rebuild
    Queries.T(spark, sf, "nation").limit(3).write
      .mode("overwrite").parquet(s"$tmp/nation.parquet")
    val rebuilt =
      Layout.bucketedView(spark, tmp.getAbsolutePath, "nation", "n_nationkey", 2)
    assert(rebuilt.count() == 3, "rewritten source must rebuild the layout")
  }
}
