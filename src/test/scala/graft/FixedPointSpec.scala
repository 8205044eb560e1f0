package graft

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Pins [[DoubleToFixed]] ("to_fixed") to the semantics it claims:
  * identical to `UnscaledValue(CAST(d AS DECIMAL(precision, scale)))`
  * including nullness AND the ANSI error behavior on overflow (the slow
  * path IS an embedded Cast, so specials inherit the session's eval mode
  * — these tests prove the fast path never shadows that). The adversarial
  * corpus targets the fast path's decision boundary: shortest-repr ties
  * (0.615-style 3-decimal values), exact cents, magnitudes near the
  * 2e14/10^s cutoff, precision-overflow values, and specials.
  */
class FixedPointSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("local[4]")

  private def df1(ds: Seq[java.lang.Double]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      ds.map(d => org.apache.spark.sql.Row(d)).asJava,
      StructType(Seq(StructField("d", DoubleType, nullable = true))))
  }

  private def fastCol(scale: Int, precision: Int): Column =
    call_function("to_fixed", col("d"), lit(scale), lit(precision))

  /** Reference lane: unscaled of the real decimal cast. DECIMAL(p,s)·10^s
    * has scale 0 and fits BIGINT for p <= 18, so the scale-up is exact. */
  private def refCol(scale: Int, precision: Int): Column =
    (col("d").cast(DecimalType(precision, scale)) * lit(DoubleToFixed.pow10(scale)))
      .cast(DecimalType(precision, 0)).cast(LongType)

  /** Outcome of one lane on ONE value: Right(resultOrNull) or
    * Left(exception class) — the ANSI-throwing inputs must throw the SAME
    * error class on both lanes. */
  private def outcome(d: java.lang.Double, c: Column): Either[Class[_], Any] =
    Try(df1(Seq(d)).select(c).head.get(0)).toEither.left.map {
      case e: org.apache.spark.SparkException if e.getCause != null => e.getCause.getClass
      case e => e.getClass
    }

  private def checkOne(d: java.lang.Double, scale: Int, precision: Int): Unit = {
    val fast = outcome(d, fastCol(scale, precision))
    val ref = outcome(d, refCol(scale, precision))
    assert(fast == ref, s"to_fixed($d, $scale, $precision): fast=$fast ref=$ref")
  }

  /** Batch compare on a domain where neither lane can throw. */
  private def checkBatch(ds: Seq[java.lang.Double], scale: Int, precision: Int): Unit = {
    functions.registerAll(spark)
    df1(ds).select(fastCol(scale, precision).as("fast"), refCol(scale, precision).as("ref"))
      .collect().zip(ds).foreach { case (r, d) =>
        assert(r.get(0) == r.get(1), s"to_fixed($d, $scale, $precision): ${r.get(0)} vs ${r.get(1)}")
      }
  }

  private val adversarial: Seq[java.lang.Double] = Seq[java.lang.Double](
    0.0, -0.0, 1.0, -1.0, 0.005, -0.005, 0.615, -0.615, 0.625, -0.625,
    0.614999999999999, 123.45, -123.45, 104949.5, 0.01, 0.015, 0.025,
    1.005, 2.675, // classic binary-representation tie cases
    9999999999.99, 9999999999999.99,
    1.9999999999999998e12, 2.0000000000000005e12, 2.1e12, 1e13, 1e14,
    4.9e-324, -4.9e-324, 1e-10, // subnormal / tiny
    null)

  // includes inputs where DECIMAL(p,s) overflows -> both lanes must agree
  // on the SAME ANSI exception (or null under non-ANSI)
  private val specials: Seq[java.lang.Double] = Seq[java.lang.Double](
    9.999999999999998e15, 1e16, 1e17, 1e18, 1e300, -1e300,
    Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)

  test("to_fixed == decimal cast on the adversarial corpus, (18,2)") {
    functions.registerAll(spark)
    checkBatch(adversarial, 2, 18)
    specials.foreach(checkOne(_, 2, 18))
  }
  test("to_fixed == decimal cast on the rate domain (6,2), incl. overflow parity") {
    functions.registerAll(spark)
    // (6,2) overflows at |d| >= 10^4: 104949.5 and the big magnitudes land
    // on the Cast's overflow path — outcome (ANSI error class) must match
    (Seq[java.lang.Double](104949.5, 9999.99, 10000.0, -10000.0) ++ specials)
      .foreach(checkOne(_, 2, 6))
    checkBatch(adversarial.filter(d => d == null || math.abs(d) < 9999), 2, 6)
  }
  test("to_fixed == decimal cast at scale 4") {
    functions.registerAll(spark)
    checkBatch(adversarial.filter(d => d == null || math.abs(d) < 1e13), 4, 18)
    specials.foreach(checkOne(_, 4, 18))
  }

  test("to_fixed == decimal cast on random doubles across magnitudes") {
    // exact 2-decimal values (the corpus regime), 3-decimal ties (fast-path
    // rejections), and raw doubles below the throw domain
    val cents = Gen.chooseNum(-20000000L, 20000000L).map(c => (c / 100.0): java.lang.Double)
    val mills = Gen.chooseNum(-2000000L, 2000000L).map(c => (c / 1000.0): java.lang.Double)
    val raw = for {
      m <- Gen.chooseNum(-1.0, 1.0)
      e <- Gen.chooseNum(-30, 12)
    } yield (m * math.pow(10, e)): java.lang.Double
    Seq(cents, mills, raw).foreach { g =>
      val ds = Gen.listOfN(400, g).sample.get
      checkBatch(ds, 2, 18)
      checkBatch(ds.filter(d => math.abs(d) < 1e13), 4, 18)
    }
  }

  test("interpreted eval agrees with codegen (constant-folded literals)") {
    functions.registerAll(spark)
    adversarial.filter(_ != null).foreach { d =>
      val lit2 = spark.sql(s"SELECT to_fixed(CAST('$d' AS DOUBLE), 2, 18)").head.get(0)
      val col2 = df1(Seq(d)).select(fastCol(2, 18)).head.get(0)
      assert(lit2 == col2, s"eval/codegen drift at $d: $lit2 vs $col2")
    }
  }

  test("q1 fixed-point formulation returns rows identical to the decimal formulation") {
    val sf = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q1_agg")(spark, sf).collect().toSeq
    // the pre-round-10 decimal formulation, inline
    def dec2(c: Column) = c.cast(DecimalType(18, 2))
    def rate(c: Column) = c.cast(DecimalType(6, 2))
    val want = Queries.T(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        round(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))), 2)
          .cast(DoubleType).as("sum_disc_price"),
        round(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
          * (lit(1) + rate(col("l_tax")))), 2).cast(DoubleType).as("sum_charge"),
        (sum(dec2(col("l_quantity"))).cast(DoubleType) / count(col("l_quantity"))).as("avg_qty"),
        (sum(dec2(col("l_extendedprice"))).cast(DoubleType) / count(col("l_extendedprice"))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().toSeq
    assert(got == want)
  }
}
