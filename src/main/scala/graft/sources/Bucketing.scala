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

  /** Write `df` as a bucketed, per-bucket-sorted managed table.
    * Robust to an ORPHANED location: a previous JVM may have left
    * the managed directory behind while this session's in-memory
    * catalog has no entry for it, in which case Overwrite refuses
    * with LOCATION_ALREADY_EXISTS — drop any catalog entry and
    * clear the stale location first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
