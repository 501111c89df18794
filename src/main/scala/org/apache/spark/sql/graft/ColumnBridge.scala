package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's package-private Column <-> catalyst Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Kept to
  * exactly these two calls; everything else in graft uses public APIs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Spark's xxhash64 primitive for one int input (same chaining as the
    * `xxhash64` SQL function: fold each argument with the running hash
    * as seed, initial seed 42).
    */
  def xxh64Int(v: Int, seed: Long): Long = XXH64.hashInt(v, seed)
}
