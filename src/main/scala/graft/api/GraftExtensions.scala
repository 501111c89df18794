package graft.api

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.ops._

/** SparkSessionExtensions injector: exposes the jsonb expression
  * library to plain Spark SQL (`spark.sql("SELECT jsonb_add(a, b)")`).
  *
  * Usage: `.config("spark.sql.extensions", "graft.api.GraftExtensions")`
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.expr.ops", name), builder))

    def binary(op: String): Seq[Expression] => Expression =
      args => JsonbBinary(op, args(0), args(1))
    def cmp(op: String): Seq[Expression] => Expression =
      args => JsonbComparison(op, args(0), args(1))

    register("jsonb_add", binary("add"))
    register("jsonb_sub", binary("sub"))
    register("jsonb_mul", binary("mul"))
    register("jsonb_div", binary("div"))
    register("jsonb_mod", binary("mod"))
    register("jsonb_pow", binary("pow"))
    register("jsonb_concat", binary("concat"))
    register("jsonb_get", binary("get"))
    register("jsonb_delete", binary("delete"))
    register("jsonb_eq", cmp("eq"))
    register("jsonb_ne", cmp("ne"))
    register("jsonb_lt", cmp("lt"))
    register("jsonb_le", cmp("le"))
    register("jsonb_gt", cmp("gt"))
    register("jsonb_ge", cmp("ge"))
    register("jsonb_contains", args => JsonbPredicate("contains", args(0), args(1)))
    register("jsonb_exists", args => JsonbPredicate("exists", args(0), args(1)))
    register("jsonb_length", args => JsonbLength(args(0)))
    register("jsonb_typerank", args => JsonbTypeRank(args(0)))
    register("jsonb_astext", args => JsonbUnary("astext", args(0)))
    register("jsonb_keys", args => JsonbUnary("keys", args(0)))
    register("jsonb_slice", args => JsonbSlice(args(0), args(1), args(2)))
    register("jsonb_set_key", args => JsonbSetKey(args(0), args(1), args(2)))
    register("jsonb_to_bool", args => JsonbCast("bool", args(0)))
    register("jsonb_to_double", args => JsonbCast("double", args(0)))
    register("jsonb_to_long", args => JsonbCast("long", args(0)))
  }
}
