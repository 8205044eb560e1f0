package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the native DSv2 Arrow IPC source/sink ([[ArrowSource]]):
  * full-type roundtrip with nulls, record-batch-granular splitting, column
  * pruning, and loud failure modes — mirror of [[AvroSpec]]. */
class ArrowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("local[4]")
  private def tmp(tag: String) = s"/root/repo/target/tmp/arrow_spec_$tag"

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("i", IntegerType, nullable = true),
    StructField("f", FloatType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("bin", BinaryType, nullable = true)))

  private val rows = Seq(
    Row(1L, 7, 1.5f, 2.25, true, "alpha", Array[Byte](1, 2, 3)),
    Row(2L, null, null, null, null, null, null),
    Row(3L, -1, -0.5f, 1e100, false, "", Array.empty[Byte]))

  test("roundtrip preserves all supported types incl. nulls") {
    val out = tmp("types")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    ArrowSource.write(df, out)
    val back = spark.read.format("graft.ArrowSource").load(out)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length === 3)
    val r1 = got(0)
    assert(r1.getInt(1) === 7 && r1.getFloat(2) === 1.5f && r1.getString(5) === "alpha")
    assert(r1.getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2, 3))
    assert((1 until 7).forall(got(1).isNullAt))
    assert(got(2).getDouble(3) === 1e100)
  }

  test("record-batch splitting: one file, many batches → many partitions, exactly-once rows") {
    val out = tmp("split")
    val df = spark.range(50000).select(col("id"), (col("id") * 3).as("v"))
    // small batches so one file holds many record batches
    ArrowSource.write(df.coalesce(1), out, batchRows = 1000)
    assert(ArrowSource.listFiles(out).size === 1)
    assert(ArrowSource.batchCount(ArrowSource.listFiles(out).head) === 50)
    val back = spark.read.format("graft.ArrowSource")
      .option("batchesPerSplit", 4).load(out)
    assert(back.rdd.getNumPartitions === 13, "ceil(50/4) batch-range partitions")
    assert(back.count() === 50000)
    assert(back.agg(sum("v")).head.getLong(0) === 3L * 49999 * 50000 / 2)
    assert(back.select("id").distinct().count() === 50000)
  }

  test("column pruning converts only required columns") {
    val out = tmp("prune")
    ArrowSource.write(
      spark.range(100).select(col("id"), (col("id") % 5).as("k"),
        concat(lit("x"), col("id")).as("pad")), out)
    val pruned = spark.read.format("graft.ArrowSource").load(out).select("k")
    assert(pruned.schema.fieldNames.sameElements(Array("k")))
    assert(pruned.distinct().count() === 5)
  }

  test("predicate pushdown reaches the scan, preserves results, and may reference pruned columns") {
    val out = tmp("filter")
    ArrowSource.write(
      spark.range(1000).select(col("id"), (col("id") % 10).as("k"),
        when(col("id") % 7 === 0, null).otherwise(concat(lit("v"), col("id"))).as("s")),
      out)
    val base = spark.read.format("graft.ArrowSource").load(out)
    // filter on k + s, but project ONLY id: pushed filters must evaluate
    // against columns pruned out of the read schema
    val q = base.filter(col("k") >= 3 && col("k") < 5 && col("s").isNotNull).select("id")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(k,3)"),
      s"scan should advertise pushed filters: $scan")
    assert(q.collect().map(_.getLong(0)).toSet ===
      (0L until 1000L).filter(i => i % 10 >= 3 && i % 10 < 5 && i % 7 != 0).toSet)
    // UTF-8 vs UTF-16 ordering + -0.0 handled by the shared PushedRowFilters
    // core (regression-tested in AvroSpec); here pin the string compare path
    assert(base.filter(col("s") === "v13").count() === 1)
  }

  test("zone-map skipping: pushed filters prune whole batches at planning") {
    val out = tmp("zmap")
    // ascending ids, 1000-row batches → batch b holds ids [1000b, 1000b+1000)
    ArrowSource.write(spark.range(50000).select(col("id"),
      (col("id") % 10).as("k")).coalesce(1), out, batchRows = 1000)
    val dataFile = ArrowSource.listFiles(out).head
    assert(ArrowSource.zmapFile(dataFile).exists(), "sink must write the sidecar")
    def scan = spark.read.format("graft.ArrowSource")
      .option("batchesPerSplit", 1).load(out)
    // unfiltered: all 50 batches planned
    assert(scan.rdd.getNumPartitions === 50)
    // range filter: only the 5 matching batches become partitions
    val lt = scan.filter(col("id") < 5000)
    assert(lt.rdd.getNumPartitions === 5, "id < 5000 must plan 5 of 50 batches")
    assert(lt.count() === 5000)
    // point filter: exactly one batch
    val eq = scan.filter(col("id") === 42042)
    assert(eq.rdd.getNumPartitions === 1)
    assert(eq.collect().map(_.getLong(0)).toSeq === Seq(42042L))
    // filter with no matching batch: nothing planned, empty result
    assert(scan.filter(col("id") > 1000000).count() === 0)
    // a filter the zones can't decide (k spans 0-9 in every batch): no skip
    assert(scan.filter(col("k") === 3).count() === 5000)
    // sidecar removed → skipping disabled, results unchanged
    ArrowSource.zmapFile(dataFile).delete()
    val noZmap = scan.filter(col("id") < 5000)
    assert(noZmap.rdd.getNumPartitions === 50)
    assert(noZmap.count() === 5000)
  }

  test("corrupt zmap sidecars disable skipping instead of pruning wrongly") {
    val out = tmp("zmap_bad")
    ArrowSource.write(spark.range(5000).select(col("id")).coalesce(1),
      out, batchRows = 1000)
    val dataFile = ArrowSource.listFiles(out).head
    val zf = ArrowSource.zmapFile(dataFile)
    val good = java.nio.file.Files.readString(zf.toPath)
    def planned(q: org.apache.spark.sql.DataFrame) = q.rdd.getNumPartitions
    def scan = spark.read.format("graft.ArrowSource")
      .option("batchesPerSplit", 1).load(out).filter(col("id") < 1000)
    assert(planned(scan) === 1, "intact sidecar prunes to 1 batch")
    // duplicated B line (all indices still present): the last-write-wins
    // row count could flip an allNull test — must reject the whole sidecar
    val dup = good + good.linesIterator.find(_.startsWith("B 0 ")).get
      .replaceAll("\\d+$", "1") + "\n"
    java.nio.file.Files.writeString(zf.toPath, dup)
    assert(ArrowSource.readZmap(dataFile, 5).isEmpty, "duplicate B index → sidecar rejected")
    assert(planned(scan) === 5, "bad sidecar disables skipping")
    assert(scan.count() === 1000)
    // missing B line
    java.nio.file.Files.writeString(zf.toPath,
      good.linesIterator.filterNot(_.startsWith("B 2 ")).mkString("\n") + "\n")
    assert(ArrowSource.readZmap(dataFile, 5).isEmpty, "missing B index → sidecar rejected")
    assert(planned(scan) === 5)
    // unknown line
    java.nio.file.Files.writeString(zf.toPath, good + "X garbage\n")
    assert(ArrowSource.readZmap(dataFile, 5).isEmpty, "unknown line → sidecar rejected")
  }

  test("heterogeneous directory fails loudly at planning") {
    val dir = tmp("hetero")
    new java.io.File(dir).mkdirs()
    ArrowSource.listFiles(dir).foreach(_.delete())
    ArrowSource.write(spark.range(10).select(col("id")), dir + "/a")
    ArrowSource.write(spark.range(10).select(col("id"), lit("x").as("s")), dir + "/b")
    // move one file of each schema into the same directory
    def moveOne(sub: String, name: String): Unit = {
      val f = ArrowSource.listFiles(dir + "/" + sub).head
      java.nio.file.Files.move(f.toPath, new java.io.File(dir, name).toPath)
    }
    moveOne("a", "0_a.arrow")
    moveOne("b", "1_b.arrow")
    val ex = intercept[Exception](
      spark.read.format("graft.ArrowSource").load(dir).collect())
    assert(ex.getMessage.contains("heterogeneous arrow directory"))
  }

  test("reading an empty/missing directory fails loudly at schema inference") {
    val dir = tmp("empty")
    new java.io.File(dir).mkdirs()
    val ex = intercept[Exception](
      spark.read.format("graft.ArrowSource").load(dir).collect())
    assert(ex.getMessage.contains("no .arrow files"))
  }

  test("unsupported sink type fails loudly on the driver") {
    val df = spark.range(3).select(col("id").cast(DecimalType(10, 2)).as("dec"))
    val ex = intercept[IllegalArgumentException](ArrowSource.write(df, tmp("bad")))
    assert(ex.getMessage.contains("unsupported type"))
  }
}
