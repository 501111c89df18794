package graft.cypher

import java.math.{BigDecimal => JBigDecimal}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import graft.jsonb._

/** Typed Aggregators implementing Cypher/PG aggregate semantics over
  * canonical-jsonb string columns (reference: collect -> jsonb_agg,
  * pg_aggregate.dat:567-571; sum/min/max over jsonb numerics keep
  * numeric exactness — no double rounding).
  *
  * Aggregators are Spark's map-side-combinable abstraction, so these
  * get partial aggregation for free (scale-safe: no groupAll driver
  * collection anywhere).
  */
object JsonbAggregates {

  private def enc: Encoder[String] = Encoders.STRING
  private implicit def tupleEnc: Encoder[(String, Long)] =
    Encoders.tuple(Encoders.STRING, Encoders.scalaLong)

  /** sum(jsonb) — exact BigDecimal accumulation; null for empty. */
  private object SumAgg extends Aggregator[String, String, String] {
    def zero: String = null
    def reduce(b: String, a: String): String =
      if (a == null) b
      else Jsonb.parse(a) match {
        case JNum(n) =>
          if (b == null) Jsonb.renderNum(n)
          else Jsonb.renderNum(new JBigDecimal(b).add(n))
        case _ => b
      }
    def merge(x: String, y: String): String =
      if (x == null) y
      else if (y == null) x
      else Jsonb.renderNum(new JBigDecimal(x).add(new JBigDecimal(y)))
    def finish(r: String): String = r
    def bufferEncoder: Encoder[String] = enc
    def outputEncoder: Encoder[String] = enc
  }

  /** avg(jsonb) — PG numeric_avg: sum/count with div-scale rules. */
  private object AvgAgg extends Aggregator[String, (String, Long), String] {
    def zero: (String, Long) = (null, 0L)
    def reduce(b: (String, Long), a: String): (String, Long) =
      if (a == null) b
      else Jsonb.parse(a) match {
        case JNum(n) =>
          val s = if (b._1 == null) n else new JBigDecimal(b._1).add(n)
          (Jsonb.renderNum(s), b._2 + 1)
        case _ => b
      }
    def merge(x: (String, Long), y: (String, Long)): (String, Long) = {
      val s =
        if (x._1 == null) y._1
        else if (y._1 == null) x._1
        else Jsonb.renderNum(new JBigDecimal(x._1).add(new JBigDecimal(y._1)))
      (s, x._2 + y._2)
    }
    def finish(r: (String, Long)): String =
      if (r._2 == 0 || r._1 == null) null
      else Jsonb.div(JNum(new JBigDecimal(r._1)),
        JNum(JBigDecimal.valueOf(r._2))) match {
        case v => v.render
      }
    def bufferEncoder: Encoder[(String, Long)] = tupleEnc
    def outputEncoder: Encoder[String] = enc
  }

  private final class ExtremeAgg(min: Boolean) extends Aggregator[String, String, String] {
    def zero: String = null
    def reduce(b: String, a: String): String =
      if (a == null) b
      else if (b == null) a
      else {
        val c = Jsonb.compare(Jsonb.parse(a), Jsonb.parse(b))
        if ((min && c < 0) || (!min && c > 0)) a else b
      }
    def merge(x: String, y: String): String = reduce(x, y)
    def finish(r: String): String = r
    def bufferEncoder: Encoder[String] = enc
    def outputEncoder: Encoder[String] = enc
  }

  /** collect(x) -> jsonb array (reference maps collect to jsonb_agg,
    * which keeps SQL NULLs as jsonb nulls; parse_cypher_expr.c:887-888).
    */
  private object CollectAgg
      extends Aggregator[String, scala.collection.mutable.ArrayBuffer[String], String] {
    // raw-string buffer: O(1) append / O(n) finish (re-rendering the
    // accumulated array per input row would be quadratic per group)
    def zero: scala.collection.mutable.ArrayBuffer[String] =
      scala.collection.mutable.ArrayBuffer.empty
    def reduce(b: scala.collection.mutable.ArrayBuffer[String], a: String) = {
      b += a; b
    }
    def merge(x: scala.collection.mutable.ArrayBuffer[String],
        y: scala.collection.mutable.ArrayBuffer[String]) = { x ++= y; x }
    // zero input rows -> SQL NULL (jsonb_agg semantics: no initcond);
    // SQL-NULL inputs collect as jsonb nulls
    def finish(r: scala.collection.mutable.ArrayBuffer[String]): String =
      if (r.isEmpty) null
      else JArr(r.iterator.map(s =>
        if (s == null) JNull else Jsonb.parse(s)).toVector).render
    def bufferEncoder = Encoders.kryo[scala.collection.mutable.ArrayBuffer[String]]
    def outputEncoder: Encoder[String] = enc
  }

  /** jsonb_object_agg(key text, value jsonb) — null keys error like
    * the reference ("field name must not be null"), SQL-NULL values
    * become jsonb nulls, duplicate keys last-wins (input order, like
    * any unordered aggregate), canonical key order on output.
    */
  private object ObjectAgg extends Aggregator[(String, String),
      scala.collection.mutable.ArrayBuffer[(String, String)], String] {
    def zero: scala.collection.mutable.ArrayBuffer[(String, String)] =
      scala.collection.mutable.ArrayBuffer.empty
    def reduce(b: scala.collection.mutable.ArrayBuffer[(String, String)],
        a: (String, String)) = {
      if (a._1 == null)
        throw new IllegalArgumentException("field name must not be null")
      b += a; b
    }
    def merge(x: scala.collection.mutable.ArrayBuffer[(String, String)],
        y: scala.collection.mutable.ArrayBuffer[(String, String)]) = { x ++= y; x }
    def finish(r: scala.collection.mutable.ArrayBuffer[(String, String)]): String =
      if (r.isEmpty) null
      else Jsonb.mkObj(r.iterator.map { case (k, v) =>
        k -> (if (v == null) (JNull: JValue) else Jsonb.parse(v))
      }.toSeq).render
    def bufferEncoder =
      Encoders.kryo[scala.collection.mutable.ArrayBuffer[(String, String)]]
    def outputEncoder: Encoder[String] = enc
  }

  def sum(c: Column): Column = udaf(SumAgg, enc).apply(c)
  def avg(c: Column): Column = udaf(AvgAgg, enc).apply(c)
  def min(c: Column): Column = udaf(new ExtremeAgg(true), enc).apply(c)
  def max(c: Column): Column = udaf(new ExtremeAgg(false), enc).apply(c)
  def collect(c: Column): Column = udaf(CollectAgg, enc).apply(c)

  // SQL-registry handles (GraftExtensions.register): collect IS the
  // reference's jsonb_agg (keeps SQL NULLs, empty group -> NULL)
  def jsonbAggUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(CollectAgg, enc)
  def jsonbObjectAggUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(ObjectAgg, Encoders.tuple(Encoders.STRING, Encoders.STRING))
}
