package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd vector kernels over embedding columns (`array<float>`).
  *
  * The higher-order-function route (`aggregate(zip_with(...))`)
  * evaluates a lambda per element with boxed Doubles and falls out of
  * whole-stage codegen; this expression compiles to a primitive float
  * loop inside the generated code — the difference is the hot loop of
  * every similarity-search pair join at 100 TB scale.
  *
  * Elements are assumed non-null (embedding vectors); accumulation is
  * left-to-right in double precision, bit-identical to the HOF form it
  * replaces (keeps DuckDB-oracle rounding agreements intact).
  */
object VectorExpressions {

  /** dot(a, b) over two float/double arrays, accumulated in double. */
  case class FloatVecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "fvec_dot"

    private def elemType(e: Expression): DataType = e.dataType match {
      case ArrayType(et, _) => et
      case other => other
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val lf = elemType(left) == FloatType
      val rf = elemType(right) == FloatType
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y
        i += 1
      }
      s
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        def get(e: Expression, v: String, i: String): String =
          if (elemType(e) == FloatType) s"((double) $v.getFloat($i))"
          else s"$v.getDouble($i)"
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${get(left, l, i)} * ${get(right, r, i)};
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column-level dot product of two `array<float>` columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
