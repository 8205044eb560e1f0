package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput at multiplied scale (BASELINE §streaming-scale).
  *
  * The streaming contract queries (q88/q94/q95) prove CORRECTNESS —
  * run-to-completion equivalence against the DuckDB oracle at sf0.1. This
  * probe measures the number a 100 TB/day ingest deploy sizes against:
  * sustained rows/second through the watermarked windowed aggregation
  * ([[Streaming.windowedCounts]]) when the corpus arrives as a genuine
  * multi-batch file tail rather than one file = one batch.
  *
  * Protocol: the events table at `SPARK_GRAFT_SF_DIR` is staged as
  * `SPLITS` contiguous event-time ranges (approxQuantile bounds — a
  * distributed split, no global sort through one task), written OLDEST
  * FIRST so file-source mod-time ordering matches event time and the
  * 10-minute watermark never drops a record mid-stream. The stream then
  * runs `FILES_PER_TRIGGER` files per micro-batch under AvailableNow to a
  * memory sink in complete mode (q88's protocol), and the result must be
  * row-IDENTICAL to the same aggregation computed as one batch — exit 1
  * on drift. Prints total events, wall seconds, rows/s, micro-batch count
  * and per-batch input sizes.
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val splits = sys.env.getOrElse("SPLITS", "16").toInt
    val mft = sys.env.getOrElse("FILES_PER_TRIGGER", "2").toInt
    val spark = Engine.session("local[32]")
    spark.sparkContext.setLogLevel("WARN")

    val stage = java.nio.file.Files.createTempDirectory("graft_stream_stage")
      .toFile.getAbsolutePath
    val chk = java.nio.file.Files.createTempDirectory("graft_stream_chk")
      .toFile.getAbsolutePath

    // raw read with the FILE's schema (nanos-long or timestamp — both
    // layouts split and restage identically through the µs-numeric view)
    val rawSchema = Streaming.probeRawSchema(spark, s"$sf/events.parquet")
    val evRaw = spark.read.schema(rawSchema).parquet(s"$sf/events.parquet")
    val ev = evRaw.withColumn("__ts_us", Engine.tsMicrosCol(evRaw))
    val total = ev.count()
    var staged = 0L
    t(s"stage $splits event-time ranges") {
      val qs = (1 until splits).map(_.toDouble / splits).toArray
      val bounds = ev.stat.approxQuantile("__ts_us", qs, 0.001).map(_.toLong)
      val los = Long.MinValue +: bounds
      val his = bounds :+ Long.MaxValue
      los.zip(his).foreach { case (lo, hi) =>
        ev.filter(col("__ts_us") >= lo && col("__ts_us") < hi)
          .drop("__ts_us")
          .coalesce(1).write.mode("append").parquet(stage)
      }
      staged = spark.read.schema(rawSchema).parquet(stage).count()
      staged
    }
    require(staged == total, s"staged $staged != source $total")

    val in = Engine.normalizeTs(
      spark.readStream.schema(Streaming.probeRawSchema(spark, stage))
        .option("maxFilesPerTrigger", mft)
        .parquet(stage))
    val t0 = System.nanoTime()
    val q = Streaming.windowedCounts(in)
      .writeStream.format("memory").queryName("graft_stream_scale")
      .outputMode("complete")
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    val streamed = spark.table("graft_stream_scale")
      .collect().map(_.mkString("|")).sorted.toSeq
    println(f"SCALE stream windowed-agg: $total%,d events in $secs%.1f s = " +
      f"${total / secs}%,.0f rows/s over ${progress.length} micro-batches " +
      s"(${streamed.length} windows; batch sizes ${progress.map(_.numInputRows).mkString(",")})")

    val batch = Streaming.windowedCounts(Engine.normalizeTs(evRaw))
      .collect().map(_.mkString("|")).sorted.toSeq
    println("SCALE stream-vs-batch rows: " +
      (if (streamed == batch) "IDENTICAL" else "MISMATCH"))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(new java.io.File(stage)); rm(new java.io.File(chk))
    val ok = streamed == batch
    spark.stop()
    if (!ok) sys.exit(1)
  }

  private def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"SCALE $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s   $n%,d rows")
  }
}
