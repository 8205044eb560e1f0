package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Seeded property tests for the null/NaN/coercion lattices (SURVEY §5:
  * the reference's correctness contract beyond its 18 example-based
  * tests). The model implementations here are independent re-statements
  * of the contract (max skipping nulls; NaN greatest and sticky; the
  * §1.3 planner coercion matrix), so a property failure localizes a
  * semantic drift, not a test-tautology.
  *
  * Raw ScalaCheck `Gen` with an explicit stepped seed (the scalatestplus
  * bridge isn't on the classpath): deterministic across runs by
  * construction.
  */
class GreatestPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("local[4]")

  /** n deterministic samples from gen, stepping a fixed seed. */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(42L)
    (1 to n).flatMap { _ =>
      val r = gen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      r
    }
  }

  private def forAll[A](gen: Gen[A], n: Int = 30)(check: A => Unit): Unit =
    samples(gen, n).foreach(check)

  private def gref(rows: Seq[Row], tpes: Seq[DataType]): Seq[Any] = {
    functions.registerAll(spark)
    val schema = StructType(tpes.zipWithIndex.map { case (t, i) =>
      StructField(s"c$i", t, nullable = true)
    })
    val d = spark.createDataFrame(rows.asJava, schema)
    d.select(functions.greatest_ref(d.columns.toSeq.map(col): _*).as("g"))
      .collect().toSeq.map(_.get(0))
  }

  // --- null-skipping max over longs --------------------------------------
  private val optLong: Gen[Option[Long]] =
    Gen.frequency(3 -> Gen.choose(-1000000L, 1000000L).map(Some(_)), 1 -> Gen.const(None))

  test("property: greatest_ref over nullable longs = max skipping nulls, NULL iff all NULL") {
    val genRows = for {
      nCols <- Gen.choose(2, 6)
      nRows <- Gen.choose(1, 40)
      rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, optLong))
    } yield (nCols, rows)
    forAll(genRows) { case (nCols, rows) =>
      val got = gref(rows.map(r => Row(r.map(_.map(x => x: Any).orNull): _*)), Seq.fill(nCols)(LongType))
      val want = rows.map { r =>
        val vs = r.flatten
        if (vs.isEmpty) null else vs.max
      }
      assert(got == want)
    }
  }

  // --- NaN-greatest over doubles -----------------------------------------
  private val optDouble: Gen[Option[Double]] = Gen.frequency(
    4 -> Gen.choose(-1e6, 1e6).map(Some(_)),
    1 -> Gen.const(Some(Double.NaN)),
    1 -> Gen.const(Some(Double.PositiveInfinity)),
    1 -> Gen.const(Some(Double.NegativeInfinity)),
    2 -> Gen.const(None))

  test("property: greatest_ref over doubles is NaN-greatest, null-skipping") {
    val genRows = for {
      nCols <- Gen.choose(2, 5)
      nRows <- Gen.choose(1, 40)
      rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, optDouble))
    } yield (nCols, rows)
    forAll(genRows) { case (nCols, rows) =>
      val got = gref(rows.map(r => Row(r.map(_.map(x => x: Any).orNull): _*)), Seq.fill(nCols)(DoubleType))
      val want: Seq[Any] = rows.map { r =>
        val vs = r.flatten
        if (vs.isEmpty) null
        else if (vs.exists(_.isNaN)) Double.NaN
        else vs.max
      }
      got.zip(want).foreach {
        case (g: Double, w: Double) => assert(g == w || (g.isNaN && w.isNaN))
        case (g, w) => assert(g == w)
      }
    }
  }

  // --- the §1.3 planner coercion matrix ----------------------------------
  /** Model of Greatest::return_type (reference greatest.rs:77-102) as we
    * implement it: date⊕timestamp→timestamp; bool⊕numeric→LONG; float64
    * dominance; else numeric widening. */
  private def modelCoerce(a: DataType, b: DataType): Option[DataType] = {
    val numeric = Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
    def rank(t: DataType) = numeric.indexOf(t)
    (a, b) match {
      case (x, y) if x == y => Some(x)
      case (DateType, TimestampType) | (TimestampType, DateType) => Some(TimestampType)
      case (BooleanType, n) if rank(n) >= 0 => Some(LongType)
      case (n, BooleanType) if rank(n) >= 0 => Some(LongType)
      case (DoubleType, n) if rank(n) >= 0 => Some(DoubleType)
      case (n, DoubleType) if rank(n) >= 0 => Some(DoubleType)
      case (FloatType, n) if rank(n) >= 0 => Some(DoubleType)
      case (n, FloatType) if rank(n) >= 0 => Some(DoubleType)
      // ^ int ⊕ float32: the reference's get_wider_type only widens within
      //   a type family, so this pair ERRORS there (binary.rs:745-788);
      //   greatest_ref accepts it as Double (documented superset, the
      //   kernel's Float64-dominance extended one step — GreatestRef.scala)
      case (x, y) if rank(x) >= 0 && rank(y) >= 0 =>
        Some(if (rank(x) >= rank(y)) x else y)
      case _ => None
    }
  }

  private val scalarTypes =
    Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
      BooleanType, DateType, TimestampType, StringType)

  test("property: greatest_ref pairwise result type follows the reference coercion matrix") {
    val genPair = for {
      a <- Gen.oneOf(scalarTypes)
      b <- Gen.oneOf(scalarTypes)
    } yield (a, b)
    forAll(genPair) { case (a, b) =>
      functions.registerAll(spark)
      val d = spark.createDataFrame(
        Seq(Row(null, null)).asJava,
        StructType(Seq(StructField("a", a, true), StructField("b", b, true))))
      val attempt = scala.util.Try(
        d.select(functions.greatest_ref(col("a"), col("b")).as("g")).schema.head.dataType)
      (modelCoerce(a, b), attempt) match {
        case (Some(expected), scala.util.Success(got)) =>
          assert(got == expected, s"greatest_ref($a, $b): got $got, want $expected")
        case (None, scala.util.Failure(e)) =>
          // incompatible pair must raise the reference's mismatch contract
          assert(e.getMessage.contains("data type mismatch") || e.getMessage.contains("no wider type"),
            s"greatest_ref($a, $b) error should carry the mismatch contract: ${e.getMessage.take(120)}")
        case (None, scala.util.Success(got))
            if a == StringType || b == StringType =>
          // string⊕string is same-type (handled above); string⊕other must fail
          fail(s"greatest_ref($a, $b) should be rejected, got $got")
        case (want, got) =>
          fail(s"greatest_ref($a, $b): model=$want, engine=$got")
      }
    }
  }

  // --- byte-lexicographic string ordering --------------------------------
  private val optStr: Gen[Option[String]] = Gen.frequency(
    4 -> Gen.listOfN(5, Gen.choose(' ', '~')).map(cs => Some(cs.mkString)),
    1 -> Gen.const(None))

  test("property: greatest_ref over strings = byte-order max skipping nulls") {
    val genRows = for {
      nCols <- Gen.choose(2, 5)
      nRows <- Gen.choose(1, 30)
      rows <- Gen.listOfN(nRows, Gen.listOfN(nCols, optStr))
    } yield (nCols, rows)
    forAll(genRows, n = 20) { case (nCols, rows) =>
      val got = gref(rows.map(r => Row(r.map(_.map(x => x: Any).orNull): _*)),
        Seq.fill(nCols)(StringType))
      // ASCII-only inputs: JVM string order == UTF-8 byte order
      val want = rows.map { r =>
        val vs = r.flatten
        if (vs.isEmpty) null else vs.max
      }
      assert(got == want)
    }
  }

  // --- decimal widening lattice (SURVEY §7.3 item 5) ---------------------
  /** Reference get_wider_decimal_type (binary.rs:721-740):
    * (max(s1,s2) + max(p1−s1, p2−s2), max(s1,s2)), precision capped at 38. */
  test("property: greatest_ref decimal pairs follow get_wider_decimal_type") {
    val genDec = for {
      p <- Gen.choose(1, 38)
      s <- Gen.choose(0, p)
    } yield DecimalType(p, s)
    forAll(Gen.zip(genDec, genDec), n = 40) { case (d1, d2) =>
      val want = {
        val scale = math.max(d1.scale, d2.scale)
        val ints = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
        DecimalType(math.min(38, ints + scale), scale)
      }
      assert(GreatestRef.widen(d1, d2) == want, s"widen($d1, $d2)")
      // and the widened type must evaluate: max of representable literals
      val big1 = new java.math.BigDecimal(s"1.5").setScale(d1.scale, java.math.RoundingMode.DOWN)
      val big2 = new java.math.BigDecimal(s"2.5").setScale(d2.scale, java.math.RoundingMode.DOWN)
      if (d1.precision - d1.scale >= 1 && d2.precision - d2.scale >= 1) {
        functions.registerAll(spark)
        val d = spark.createDataFrame(
          Seq(Row(big1, big2)).asJava,
          StructType(Seq(StructField("a", d1, true), StructField("b", d2, true))))
        val got = d.select(functions.greatest_ref(col("a"), col("b")).as("g")).head.getDecimal(0)
        assert(got.compareTo(big2.max(big1)) == 0, s"greatest($big1: $d1, $big2: $d2) = $got")
      }
    }
  }
}
