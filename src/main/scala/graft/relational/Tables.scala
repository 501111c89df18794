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
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
      // reader rejects; read nanos as long and downcast to micros
      // (integer div — no double rounding). Schema-conditional so a
      // re-laid-out copy (already micros) loads unchanged.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      else df
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
