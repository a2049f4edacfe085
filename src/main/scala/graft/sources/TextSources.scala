package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-oriented text sources/sinks: JSONL (the interchange format
  * LLM data pipelines actually ingest — one JSON document per line,
  * e.g. CommonCrawl derivatives, Dolma shards) and CSV. Both ride
  * Spark's native readers — splittable, predicate-pushdown-capable
  * (CSV), schema-on-read with an EXPLICIT schema: at 100 TB,
  * `inferSchema` is a full extra pass over the data and a silent
  * type-drift hazard, so these entry points require the caller's
  * StructType and keep corrupt rows visible in a `_corrupt_record`
  * column (PERMISSIVE) instead of dropping them silently.
  *
  * No reference counterpart (the reference is parquet+JDBC only) —
  * extension tier, SURVEY §2.1.
  */
object TextSources {

  /** JSON-lines read with explicit schema. Multiline stays false —
    * one doc per line is what makes the format splittable. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  def writeJsonl(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** CSV read with explicit schema and header. */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", "true").csv(path)
}
