package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Greatest, Literal}
import org.apache.spark.sql.types._

/** Reference-parity `greatest` — the coercion matrix of the reference's
  * planner path (`Greatest::return_type`, reference
  * `datafusion/functions-nested/src/greatest.rs:77-102`) with the kernel /
  * Python-binding Float64-dominance tiebreak (`greatest.rs:159-172`,
  * reference `src/lib.rs:37-53`), then delegating row-wise evaluation to
  * Spark's codegen'd [[Greatest]] (whose null-skip + NaN-greatest ordering
  * already matches the reference kernels, `greatest.rs:261-278,370-383`).
  *
  * Spark-first design note: we do NOT re-implement the per-type max kernels
  * (`greatest.rs:241-517`); inserting `Cast`s to the reference common type
  * and reusing Spark's whole-stage-codegen `Greatest` is both faster and
  * semantically identical per the reference's own differential test
  * (`tests/greatest_test.py` uses Spark as the oracle).
  *
  * Divergences from Spark's builtin `greatest` (kept intentionally):
  *   - boolean ⊕ numeric → LongType (greatest.rs:91-94); Spark errors.
  *   - int ⊕ float → DoubleType (Float64 dominance); Spark gives FloatType.
  *   - date ⊕ timestamp → TimestampType (greatest.rs:87-90); same as Spark.
  */
object GreatestRef {

  private val intRank: Map[DataType, Int] =
    Map(ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3)

  private def decimalFor(i: DataType): DecimalType = i match {
    case ByteType    => DecimalType(3, 0)
    case ShortType   => DecimalType(5, 0)
    case IntegerType => DecimalType(10, 0)
    case _           => DecimalType(20, 0)
  }

  /** Widen two types per the reference matrix; error ≈ greatest.rs:1034-1054. */
  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, x) => x
    case (x, NullType) => x
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    // planner rule greatest.rs:91-94: bool ⊕ numeric → Int64
    case (BooleanType, _: NumericType) | (_: NumericType, BooleanType) => LongType
    // Float64 dominance (kernel greatest.rs:162-165 / python lib.rs:40-42)
    case (DoubleType, _: NumericType) | (_: NumericType, DoubleType) => DoubleType
    // arrow get_wider_type: f32 cannot hold i32/i64/decimal exactly → f64
    case (FloatType, i) if intRank.contains(i) => DoubleType
    case (i, FloatType) if intRank.contains(i) => DoubleType
    case (FloatType, _: DecimalType) | (_: DecimalType, FloatType) => DoubleType
    case (d1: DecimalType, d2: DecimalType) =>
      val ints = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
      val scale = math.max(d1.scale, d2.scale)
      DecimalType(math.min(38, ints + scale), scale)
    case (d: DecimalType, i) if intRank.contains(i) => widen(d, decimalFor(i))
    case (i, d: DecimalType) if intRank.contains(i) => widen(decimalFor(i), d)
    case (x, y) if intRank.contains(x) && intRank.contains(y) =>
      if (intRank(x) >= intRank(y)) x else y
    case (x, y) =>
      throw new SparkException(
        s"cannot resolve 'greatest' due to data type mismatch: no wider type for " +
          s"${x.sql} vs ${y.sql}")
  }

  def commonType(types: Seq[DataType]): DataType = types.reduceLeft(widen)

  /** FunctionRegistry builder for `greatest_ref(...)`.
    * Arity contract = reference planner greatest.rs:78-82 + python lib.rs:59-63.
    */
  def build(children: Seq[Expression]): Expression = {
    if (children.size < 2)
      throw new SparkException(
        s"greatest function requires at least two arguments, got ${children.size}; " +
          "greatest should take at least 2 columns")
    val ct = commonType(children.map(_.dataType))
    if (ct == NullType) Literal.create(null, NullType) // all-null fast path lib.rs:84-88
    else Greatest(children.map(c =>
      if (c.dataType == ct) c else Cast(c, ct, Some("UTC"))))
  }
}
