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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]). Sessions built via `GraftSession`
    * read nanos as Long (`spark.sql.legacy.parquet.nanosAsLong` set
    * at session build — not here, so reads stay order-independent);
    * this loader rebuilds a microsecond timestamp with integral
    * division — exact (no double round-trip; 2024 epoch-nanos ≈
    * 1.7e18 exceeds double's 53-bit mantissa) and identical to
    * DuckDB's ns→µs truncation. */
  def events(s: SparkSession, d: String): DataFrame = {
    table(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
