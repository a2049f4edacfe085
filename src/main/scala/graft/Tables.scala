package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the harness testdata layout
  * (`<sfDir>/<table>.parquet`, schemas in FIXTURES.md).
  *
  * All reads are plain parquet scans so Catalyst keeps full pushdown:
  * filters and column pruning authored in downstream queries reach the
  * `FileSourceScanExec` (visible as `PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`). Mirrors the reference's footer-inferred
  * reads (/root/reference/yellow_taxi_etl.py:67, cleaning.py:7).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Batch glob / multi-file scan with footer schema merge (S2 —
    * the reference glob-reads its 12 monthly files with a
    * star-dot-parquet pattern, /root/reference/cleaning.py:7).
    * `mergeSchema`
    * unions the footers, so union-compatible files that differ in
    * columns (a column added mid-year) read as one relation with
    * nulls where a file lacks the column. Schema merge costs one
    * footer read per file at planning — fine at any scale; the scan
    * itself stays a plain distributed FileSourceScan with pushdown. */
  def glob(spark: SparkSession, pattern: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(pattern)

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** Normalize an events relation's `ts` to a session-zoned
    * TimestampType, ADAPTIVELY on the dtype the scan actually
    * produced — a 100 TB lake holds files written by different
    * engines over years, so the loader must not assume one physical
    * encoding:
    *  - `LongType`: parquet TIMESTAMP(NANOS) read via `nanosAsLong`
    *    (set at `GraftSession` build; Spark 4 otherwise rejects nanos
    *    with [PARQUET_TYPE_ILLEGAL]). Rebuilt with integral division
    *    — exact (no double round-trip; 2024 epoch-nanos ≈ 1.7e18
    *    exceeds double's 53-bit mantissa), identical to DuckDB's
    *    ns→µs truncation.
    *  - `TimestampNTZType`: parquet timestamp[us]/[ms] without UTC
    *    adjustment. Cast to TimestampType — identical wall-clock
    *    under the pinned-UTC session.
    *  - `TimestampType`: already an instant; pass through. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported physical read type $other " +
          "(expected epoch-nanos LongType, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
