package graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `gcd` / `lcm` — DataFusion ships these as scalar functions
  * (reference `datafusion/functions/src/math/{gcd,lcm}.rs`) and Spark has no
  * builtin, so they are the one spot in SURVEY §2.7 needing a real custom
  * Catalyst expression. Implemented with `doGenCode` so they stay inside
  * whole-stage codegen (no UDF/serialization cost at 100 TB scale).
  */
case class Gcd(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Gcd.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y, t) = (ctx.freshName("x"), ctx.freshName("y"), ctx.freshName("t"))
      s"""
         |long $x = java.lang.Math.abs((long)$a);
         |long $y = java.lang.Math.abs((long)$b);
         |while ($y != 0L) { long $t = $y; $y = $x % $y; $x = $t; }
         |${ev.value} = $x;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Gcd = copy(l, r)
}

object Gcd {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0L) { val t = y; y = x % y; x = t }
    x
  }
  /** FunctionRegistry builder: coerce both args to long like DataFusion's
    * signature (int64 domain). */
  def build(children: Seq[Expression]): Expression = {
    require(children.size == 2, "gcd requires exactly two arguments")
    Gcd(Cast(children(0), LongType), Cast(children(1), LongType))
  }
}

case class Lcm(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[Long], b.asInstanceOf[Long])
    if (x == 0L || y == 0L) 0L else math.abs(x / Gcd.gcd(x, y) * y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y, g, t) =
        (ctx.freshName("x"), ctx.freshName("y"), ctx.freshName("g"), ctx.freshName("t"))
      s"""
         |long $x = java.lang.Math.abs((long)$a);
         |long $y = java.lang.Math.abs((long)$b);
         |if ($x == 0L || $y == 0L) { ${ev.value} = 0L; } else {
         |  long $g = $x; long ${t}0 = $y;
         |  while (${t}0 != 0L) { long $t = ${t}0; ${t}0 = $g % ${t}0; $g = $t; }
         |  ${ev.value} = $x / $g * $y;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Lcm = copy(l, r)
}

object Lcm {
  def build(children: Seq[Expression]): Expression = {
    require(children.size == 2, "lcm requires exactly two arguments")
    Lcm(Cast(children(0), LongType), Cast(children(1), LongType))
  }
}
