package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output sinks (SURVEY.md §2.1 S3-S6): the reference persists its
  * seven analytics tables to MySQL over JDBC
  * (/root/reference/yellow_taxi_etl.py:37-48, call sites :205-211),
  * writes cleaned parquet (cleaning.py:20), and previews to console
  * (cleaning.py:23). The sink is a trait so the same pipeline runs
  * against parquet in the harness (zero egress — no MySQL here) and
  * JDBC in production; JdbcSink is exercised in tests against an
  * in-process fake java.sql.Driver.
  *
  * Scale notes: both file and JDBC writes are executed per partition
  * on the executors (JDBC opens one connection per partition —
  * Spark's JdbcUtils.savePartition), so the sink never funnels
  * through the driver. For very wide clusters cap write parallelism
  * upstream (`df.coalesce(n)`) to stay under the database's
  * connection budget.
  */
trait Sink {
  def write(df: DataFrame, table: String, mode: SaveMode): Unit
}

/** Parquet directory sink — one subdirectory per table (S3). */
final class ParquetSink(baseDir: String) extends Sink {
  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).parquet(s"$baseDir/$table")
}

/** Hive-layout partitioned parquet sink: rows land in
  * `table/col=value/` directories, so later reads that filter on the
  * partition columns scan ONLY the matching directories (partition
  * pruning — `PartitionFilters` in the scan, zero data files touched
  * for pruned values). The layout every at-scale pipeline writes:
  * partition by ingest date / source, prune at read. Choose
  * partition columns with bounded cardinality — one directory (and
  * at least one file) per value per write. */
final class PartitionedParquetSink(baseDir: String,
    partitionCols: Seq[String]) extends Sink {
  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*)
      .parquet(s"$baseDir/$table")
}

/** JDBC sink (S4) — matches the reference's writer option-for-option
  * (yellow_taxi_etl.py:37-48: url/dbtable/user/password/driver, then
  * mode + save). */
final class JdbcSink(url: String, user: String, password: String,
    driver: String) extends Sink {
  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("driver", driver)
      .mode(mode)
      .save()
}

/** Console sink (S5) — cleaning.py:23's `df.show()`. */
final class ConsoleSink(numRows: Int = 20) extends Sink {
  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.show(numRows)
}

object Sinks {

  /** Per-sink write-mode plumbing (S6): the reference runs all
    * tables in append or overwrite per the CLI flag, EXCEPT
    * `fare_anomalies`, which is always overwritten because its p99
    * threshold is recomputed per run and appending would mix
    * thresholds (yellow_taxi_etl.py:56,207; new_etl.py:94). */
  def writeAll(tables: Seq[(String, DataFrame)], sink: Sink,
      overwrite: Boolean,
      alwaysOverwrite: Set[String] = Set("fare_anomalies")): Unit = {
    val base = if (overwrite) SaveMode.Overwrite else SaveMode.Append
    tables.foreach { case (name, df) =>
      val mode = if (alwaysOverwrite(name)) SaveMode.Overwrite else base
      sink.write(df, name, mode)
    }
  }
}
