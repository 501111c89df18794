package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: the co-located-join primitive for repeated
  * large-fact joins (SURVEY §2.3 / §4.2 partitioning row). Writing both
  * sides bucketed + sorted by the join key lets every subsequent join
  * run shuffle-free AND sort-free — at 100 TB the one-time layout cost
  * amortizes over every downstream query (the Spark analog of the
  * reference clustering a label table by its graphid index).
  *
  * The property-index DDL (SURVEY §2.12) maps here: a "property index"
  * becomes a bucket/sort layout hint on the label's parquet.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key: with equal
    * bucket counts Catalyst plans a sort-merge join with NO exchange on
    * either side (and no sort, because buckets are pre-sorted).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }

  /** Hive-style partitioned layout: one directory per key value, so a
    * key-filtered read never opens the other partitions' files AT ALL
    * (partition pruning happens in the file index, before any footer
    * or row group is touched — stronger than min/max skipping). The
    * right layout for low-cardinality selective columns (source, lang,
    * date); bucketing remains the layout for high-cardinality join
    * keys. At 100 TB the two compose: partition by date/source,
    * bucket by join key within each partition.
    */
  def writePartitioned(df: DataFrame, path: String, keys: String*): Unit =
    df.write.mode("overwrite").partitionBy(keys: _*).parquet(path)
}
