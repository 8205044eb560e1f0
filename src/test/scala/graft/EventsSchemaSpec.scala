package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the events event-time schema drift (round 7).
  *
  * The driver has shipped `events.parquet` in two physical layouts:
  * TIMESTAMP(NANOS) (admitted only as raw long under the legacy conf) and
  * plain timestamp[us] with no timezone (TIMESTAMP_NTZ). A hard-coded
  * assumption about either breaks loudly (analyzer error) on the batch
  * path or SILENTLY on a hard-coded read-schema: µs values long-coerced
  * then ÷1000 land windows in 1970-01. This spec pins the contract for
  * every events entry point: `ts` is session-TZ TimestampType and max(ts)
  * is in the data's real era — never 1970.
  */
class EventsSchemaSpec extends AnyFunSuite {

  lazy val spark = Engine.session("local[4]")
  private val sf = "/root/testdata/sf0.001"

  private def assertRealEra(maxTs: java.sql.Timestamp): Unit = {
    val year = maxTs.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
    assert(year >= 2000 && year <= 2100,
      s"events max(ts) must be in the data's real era, got $maxTs — " +
        "a 1970 value means a hard-coded physical layout corrupted the read")
  }

  test("batch view (Engine.registerTables): ts is TimestampType, real era") {
    Engine.prepare(spark, sf)
    val df = spark.table("events")
    assert(df.schema("ts").dataType == TimestampType,
      s"registered events view must normalize ts, got ${df.schema("ts").dataType}")
    assertRealEra(df.agg(max("ts")).head().getTimestamp(0))
  }

  test("Queries.T: ts is TimestampType, real era") {
    val df = Queries.T(spark, sf, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assertRealEra(df.agg(max("ts")).head().getTimestamp(0))
  }

  test("Streaming.eventStream: ts is TimestampType, real era end-to-end") {
    val stream = Streaming.eventStream(spark, sf)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType,
      s"eventStream must normalize ts, got ${stream.schema("ts").dataType}")
    val name = "events_schema_guard"
    val q = stream.agg(max("ts").as("mx")).writeStream
      .format("memory").queryName(name).outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()
    assertRealEra(spark.table(name).head().getTimestamp(0))
  }

  test("registerTables fails fast and readably on testdata schema drift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toFile
    // a "nation" with a drifted n_regionkey type (string instead of int)
    Seq((1, "NATION_1", "oops")).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val ex = intercept[IllegalStateException] {
      Engine.registerTables(spark, dir.getAbsolutePath)
    }
    assert(ex.getMessage.contains("testdata schema changed: nation.n_regionkey"),
      s"drift message must name table.column and types, got: ${ex.getMessage}")
    assert(ex.getMessage.contains("int -> string"))
    // renamed/missing column → the column-list form of the message
    Seq((1, "x")).toDF("n_nationkey", "n_label")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val ex2 = intercept[IllegalStateException] {
      Engine.registerTables(spark, dir.getAbsolutePath)
    }
    assert(ex2.getMessage.contains("testdata schema changed: nation columns"))
    // restore the real views for any spec running after this one
    Engine.registerTables(spark, sf)
  }

  test("normalizeTs covers both physical layouts with identical values") {
    import spark.implicits._
    // micros since epoch for 2025-06-01T12:00:00Z and one second later
    val micros = Seq(1748779200000000L, 1748779201000000L)
    // long layout: legacy TIMESTAMP(NANOS) surfaces as nanos-as-long
    val asNanosLong = micros.map(_ * 1000L).toDF("ts")
    // NTZ layout: current files read as TIMESTAMP_NTZ (session is UTC)
    val asNtz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val a = Engine.normalizeTs(asNanosLong)
    val b = Engine.normalizeTs(asNtz)
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val va = a.orderBy("ts").as[java.sql.Timestamp].collect().toSeq
    val vb = b.orderBy("ts").as[java.sql.Timestamp].collect().toSeq
    assert(va == vb, s"layouts must normalize to identical instants: $va vs $vb")
    // already-normalized frames pass through untouched
    val c = Engine.normalizeTs(a)
    assert(c.orderBy("ts").as[java.sql.Timestamp].collect().toSeq == va)
    // and the µs numeric view agrees across layouts
    val ma = asNanosLong.select(Engine.tsMicrosCol(asNanosLong).as("us"))
      .orderBy("us").as[Long].collect().toSeq
    val mb = asNtz.select(Engine.tsMicrosCol(asNtz).as("us"))
      .orderBy("us").as[Long].collect().toSeq
    assert(ma == micros && mb == micros, s"tsMicrosCol drift: $ma / $mb")
  }
}
