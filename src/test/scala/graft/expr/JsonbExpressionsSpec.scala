package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** The same golden semantics as JsonbSpec but executed through Spark
  * plans (whole-stage codegen path of the custom expressions).
  */
class JsonbExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any = {
    val row = Seq(1).toDF("x").select(c.as("r")).collect()(0)
    if (row.isNullAt(0)) null else row.get(0)
  }

  test("arithmetic through codegen") {
    assert(one(J.add(J.lit("1"), J.lit("1"))) == "2")
    assert(one(J.add(J.lit("\"1\""), J.lit("1"))) == "\"11\"")
    assert(one(J.div(J.lit("2"), J.lit("2"))) == "1")
    assert(one(J.pow(J.lit("2"), J.lit("2"))) == "4")
    assert(one(J.add(J.lit("[0]"), J.lit("[1]"))) == "[0, 1]")
    assert(one(J.uminus(J.lit("1"))) == "-1")
  }

  test("comparisons (3VL: null operand -> null)") {
    assert(one(J.eq(J.lit("7"), J.lit("7.0"))) == true)
    assert(one(J.lt(J.lit("\"a\""), J.lit("1"))) == true) // string < number rank
    assert(one(J.gt(J.lit("{}"), J.lit("[]"))) == true)   // object > array
    assert(one(J.eq(lit(null).cast("string"), J.lit("1"))) == null)
  }

  test("property access and slices") {
    val m = J.lit("""{"a": 1, "b": {"c": [10, 20, 30]}}""")
    assert(one(J.getKey(m, "a")) == "1")
    assert(one(J.getKey(J.getKey(m, "b"), "c")) == "[10, 20, 30]")
    assert(one(J.getKey(m, "zz")) == null)
    val l = J.lit("[0, 1, 2, 3, 4]")
    assert(one(J.getDyn(l, J.lit("1"))) == "1")
    assert(one(J.getDyn(l, J.lit("-1"))) == "4")
    assert(one(J.slice(l, J.lit("1"), J.lit("3"))) == "[1, 2]")
    assert(one(J.slice(l, lit(null).cast("string"), J.lit("-2"))) == "[0, 1, 2]")
    assert(one(J.slice(l, J.lit("-2"), lit(null).cast("string"))) == "[3, 4]")
  }

  test("set/delete keys (write-path ops)") {
    val m = J.lit("""{"a": 1}""")
    assert(one(J.setKey(m, lit("b"), J.lit("2"))) == """{"a": 1, "b": 2}""")
    assert(one(J.setKey(m, lit("a"), lit(null).cast("string"))) == "{}")
    assert(one(J.concat(m, J.lit("""{"b": 2, "a": 9}"""))) == """{"a": 9, "b": 2}""")
    // `||` wrap rules (jsonb.out:4078-4177): non-array operands wrap
    // when the other side is an array; two non-arrays pair into one
    assert(one(J.concat(J.lit("""["a", "b"]"""), J.lit("""["c"]""")))
      == """["a", "b", "c"]""")
    assert(one(J.concat(J.lit("""{"a": "b"}"""), J.lit("[]")))
      == """[{"a": "b"}]""")
    assert(one(J.concat(J.lit("3"), J.lit("[]"))) == "[3]")
    assert(one(J.concat(J.lit("3"), J.lit("4"))) == "[3, 4]")
    assert(one(J.concat(J.lit("3"), J.lit("{}"))) == "[3, {}]")
    assert(one(J.deleteKey(J.lit("""{"a": 1, "b": 2}"""), lit("a"))) == """{"b": 2}""")
  }

  test("casts and scalar fns") {
    assert(one(J.toBool(J.lit("\"\""))) == false)
    assert(one(J.toBool(J.lit("[0]"))) == true)
    assert(one(J.toLong(J.lit("7.9"))) == 7L)
    assert(one(J.toDouble(J.lit("3.14"))) == 3.14)
    assert(one(J.asText(J.lit("\"hi\""))) == "hi")
    assert(one(J.fromText(lit("hi"))) == "\"hi\"")
    assert(one(J.lengthOf(J.lit("[1, 2, 3]"))) == 3L)
    assert(one(J.keysOf(J.lit("""{"a": 1, "b": 2}"""))) == """["a", "b"]""")
    assert(one(J.head(J.lit("[1, 2, 3]"))) == "1")
    assert(one(J.last(J.lit("[1, 2, 3]"))) == "3")
    assert(one(J.tail(J.lit("[1, 2, 3]"))) == "[2, 3]")
    assert(one(J.toStringFn(J.lit("3.14"))) == "\"3.14\"")
    assert(one(J.toBooleanFn(J.lit("\"true\""))) == "true")
  }

  test("predicates") {
    assert(one(J.contains(J.lit("""{"a": 1, "b": 2}"""), J.lit("""{"a": 1}"""))) == true)
    assert(one(J.existsKey(J.lit("""{"a": 1}"""), lit("a"))) == true)
    assert(one(J.existsKey(J.lit("""{"a": 1}"""), lit("z"))) == false)
  }

  test("expressions survive a real distributed plan (groupBy on jsonb)") {
    val df = (1 to 100).map(i => (i, s"""{"k": ${i % 3}}""")).toDF("i", "props")
    val out = df.select(J.getKey(col("props"), "k").as("k"))
      .groupBy("k").count().orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("0", 33L), ("1", 34L), ("2", 33L)))
  }
}
