package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffle a relation ONCE at write time so
  * every later equi-join or aggregation on the bucket key plans with
  * zero Exchange — the storage-level answer to "this join shuffles
  * 100 TB every night". Both sides bucketed into the same count on
  * the join key → SortMergeJoin reads co-located buckets directly
  * (verified by BucketingSpec: no Exchange in the join plan).
  *
  * The reference has no bucketing (its joins don't exist —
  * SURVEY.md §2.7); this is engine-tier infrastructure for the
  * catalog's star joins at scale. Bucket count is a capacity
  * decision: ~(table size / healthy partition size), fixed at write
  * time; re-bucket when the table grows 10×.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
