package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contract-query corpus: one entry per SURVEY §2 inventory row (plus the
  * LLM-pipeline operators). Each entry pairs an idiomatic-Spark DataFrame
  * query with the ANSI-SQL oracle the driver runs in DuckDB.
  *
  * Hash-stability rule (driver compares value hashes): floating aggregation
  * is order-dependent, so every SUM/AVG over the double money columns is
  * computed over exact decimals (inputs are 2-decimal by construction,
  * TESTDATA.md) with an explicit final type, identically on both sides.
  * Every query ends with a deterministic ORDER BY over a unique key set.
  */
object Queries {
  type Q = (SparkSession, String) => DataFrame
  final case class Entry(name: String, oracle: Option[String], q: Q)

  /** Read a testdata table; `events` needs the nanos→micros rebuild (see
    * [[Engine.registerTables]]). */
  def T(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else s.read.parquet(s"$dir/$name.parquet")

  // --- decimal-exact aggregation helpers -----------------------------------
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def rate(c: Column): Column = c.cast(DecimalType(6, 2))
  private def money(c: Column): Column = sum(dec2(c)).cast(DecimalType(38, 2))
  private def avgOf(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(c)

  private def e(name: String, oracle: String)(q: Q): Entry = Entry(name, Some(oracle), q)
  private def rowsOnly(name: String)(q: Q): Entry = Entry(name, None, q)

  // =========================================================================
  // Core relational surface (SURVEY §2.3-2.5)
  // =========================================================================

  /** TPC-H Q1: scan → filter → hash agg (partial+final) → sort.
    * Scale: single shuffle on the 6-value group key; map-side combine does
    * almost all the work, so this is scan-bound at 100 TB.
    */
  private val q1Agg = e("q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2))) * (1 + CAST(l_tax AS DECIMAL(6,2)))) AS DECIMAL(38,6)) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(col("l_quantity")).as("sum_qty"),
        money(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast(DecimalType(38, 4)).as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
          * (lit(1) + rate(col("l_tax")))).cast(DecimalType(38, 6)).as("sum_charge"),
        avgOf(col("l_quantity")).as("avg_qty"),
        avgOf(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6: selective filter → global agg. Predicates push to parquet. */
  private val q6Filter = e("q6_selective_filter",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(6,2))) AS DECIMAL(38,4)) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType)
        && col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType)
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * rate(col("l_discount")))
        .cast(DecimalType(38, 4)).as("revenue"))
  }

  /** TPC-H Q3: 3-way join → agg → top-k.
    * Scale: customer side is filtered then broadcast; orders⋈lineitem is the
    * one shuffle; final ORDER BY + LIMIT is TakeOrderedAndProject (no global
    * sort materialization).
    */
  private val q3JoinTopk = e("q3_join_topk",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))) AS DECIMAL(38,4)) AS revenue,
      |  CAST(o_orderdate AS DATE) AS orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
      |GROUP BY l_orderkey, orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cust = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = T(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast(TimestampType))
    val li = T(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15 00:00:00").cast(TimestampType))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast(DateType).as("orderdate"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .cast(DecimalType(38, 4)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val all: Seq[Entry] = Seq(q1Agg, q6Filter, q3JoinTopk)
}
