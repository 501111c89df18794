package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The jsonb library through plain Spark SQL (SparkSessionExtensions
  * injection — SURVEY §4.3's extension surface).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // the shared test session already exists; use the runtime
    // registration path (the extensions class is the same list)
    val s = graft.SparkTestBase.spark
    GraftExtensions.register(s)
    s
  }

  test("jsonb functions callable from spark.sql") {
    def one(sql: String): Any = {
      val r = spark.sql(sql).collect()(0)
      if (r.isNullAt(0)) null else r.get(0)
    }
    assert(one("SELECT jsonb_add('1', '2')") == "3")
    assert(one("SELECT jsonb_add('\"a\"', '\"b\"')") == "\"ab\"")
    assert(one("SELECT jsonb_get('{\"k\": [1, 2]}', '\"k\"')") == "[1, 2]")
    assert(one("SELECT jsonb_eq('7', '7.0')") == true)
    assert(one("SELECT jsonb_contains('[1, 2, 3]', '2')") == true)
    assert(one("SELECT jsonb_length('[1, 2, 3]')") == 3L)
    assert(one("SELECT jsonb_to_long('41.9')") == 41L)
    // usable inside real queries over tables
    spark.range(5).selectExpr("concat('{\"v\": ', id, '}') AS j")
      .createOrReplaceTempView("jt")
    val sum = spark.sql(
      "SELECT sum(jsonb_to_long(jsonb_get(j, '\"v\"'))) FROM jt")
      .collect()(0).getLong(0)
    assert(sum == 10L)
  }
}
