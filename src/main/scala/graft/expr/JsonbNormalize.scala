package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.jsonb._

/** Structural jsonb helpers used by the Cypher compiler:
  * re-canonicalize a concatenated JSON text (key sort, dup removal) and
  * split a jsonb array into its elements as array<string> for Spark
  * higher-order functions (list comprehension without UDFs).
  */
object JsonbNormalizeRT {
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(Jsonb.parse(s.toString).render)

  def splitArray(s: UTF8String): GenericArrayData = Jsonb.parse(s.toString) match {
    case JArr(items) =>
      new GenericArrayData(items.map(i => UTF8String.fromString(i.render)).toArray[Any])
    case _ => null
  }
}

object JsonbNormalize {
  case class Normalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "jsonb_normalize"
    override def nullSafeEval(x: Any): Any =
      JsonbNormalizeRT.normalize(x.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.expr.JsonbNormalizeRT.normalize($x)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class SplitArray(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "jsonb_split_array"
    override def nullSafeEval(x: Any): Any =
      JsonbNormalizeRT.splitArray(x.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x =>
        s"""${ev.value} = graft.expr.JsonbNormalizeRT.splitArray($x);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def normalize(c: Column): Column = ColumnBridge.column(Normalize(ColumnBridge.expression(c)))
  def splitArray(c: Column): Column = ColumnBridge.column(SplitArray(ColumnBridge.expression(c)))
}
