package graft

import org.apache.spark.sql.SparkSession

// temporary profiling scratch — not part of the library surface
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val name = args(0)
    val fn = SparkEntry.queries(name)
    // warm
    fn(spark, d).count()
    val t0 = System.nanoTime()
    fn(spark, d).count()
    println(f"STEADY ${(System.nanoTime() - t0) / 1e9}%.2f s")
    fn(spark, d).explain("formatted")
    spark.stop()
  }
}
