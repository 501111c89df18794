package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  * Each table is a single parquet file under the scale-factor dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts layout varies by generator version: TIMESTAMP(NANOS)
      // (vectorized reader rejects -> read nanos as long, integer-div
      // down to micros) or TIMESTAMP(MICROS) without UTC adjustment
      // (reads as TIMESTAMP_NTZ -> cast; session tz is pinned UTC so
      // the instant is unchanged). Schema-conditional so every layout
      // loads to the same TIMESTAMP column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => df
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so SQL-form queries work too.
    * Once per (session, dir): each registration re-reads parquet
    * footers for schema, which would otherwise tax every SQL-form query.
    */
  private val lastDir = scala.collection.mutable.Map[SparkSession, String]()
  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    // keyed by the LAST registered dir (not a set): switching dirs
    // re-registers, and switching back re-registers again
    if (!lastDir.get(spark).contains(sfDir)) {
      all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
      lastDir(spark) = sfDir
    }
  }
}
