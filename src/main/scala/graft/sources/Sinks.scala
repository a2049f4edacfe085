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

/** Keyed upsert ("merge") parquet sink: each write merges the batch
  * into the existing snapshot — new keys insert, existing keys are
  * replaced by the incoming row (SCD type-1, the nightly-refresh
  * pattern). Implementation is the lakehouse-without-a-lakehouse
  * shape: read current snapshot, anti-join out the keys the batch
  * replaces, union, write to a fresh directory, atomically swap the
  * pointer file. At scale the anti-join broadcasts the (small) batch
  * key set; a real deployment graduates to a format with row-level
  * deletes (Delta/Iceberg) once batches stop being small — this sink
  * documents the exact seam where that swap happens.
  *
  * The pointer file (`_current`) names the live snapshot directory —
  * readers resolve it via [[UpsertParquetSink.read]]; the swap is a
  * rename-free single-file overwrite, so a crashed write leaves the
  * previous snapshot intact. */
final class UpsertParquetSink(baseDir: String, keyCols: Seq[String])
    extends Sink {
  import org.apache.spark.sql.functions.col

  private def pointer(table: String) =
    java.nio.file.Paths.get(s"$baseDir/$table/_current")

  private def currentDir(table: String): Option[String] = {
    val p = pointer(table)
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit = {
    val spark = df.sparkSession
    val merged = (mode, currentDir(table)) match {
      case (SaveMode.Overwrite, _) | (_, None) => df
      case (_, Some(dir)) =>
        val cur = spark.read.parquet(s"$baseDir/$table/$dir")
        val keys = df.select(keyCols.map(col): _*).distinct()
        cur.join(org.apache.spark.sql.functions.broadcast(keys),
            keyCols, "left_anti")
          .unionByName(df)
    }
    val next = s"snap_${System.currentTimeMillis()}_${merged.hashCode()}"
    merged.write.mode(SaveMode.Overwrite)
      .parquet(s"$baseDir/$table/$next")
    java.nio.file.Files.createDirectories(pointer(table).getParent)
    java.nio.file.Files.write(pointer(table), next.getBytes("UTF-8"))
  }
}

object UpsertParquetSink {
  /** Resolve the live snapshot of an upsert table. */
  def read(spark: org.apache.spark.sql.SparkSession, baseDir: String,
      table: String): DataFrame = {
    val p = java.nio.file.Paths.get(s"$baseDir/$table/_current")
    val dir = new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim
    spark.read.parquet(s"$baseDir/$table/$dir")
  }

  /** All retained snapshots, oldest first (snapshot names embed their
    * write-time millis, so lexicographic ≈ chronological). Every
    * write keeps the previous snapshot intact — that is what makes
    * the pointer swap crash-safe — so until a retention sweep deletes
    * them, history is time-travel-readable for free. */
  def snapshots(baseDir: String, table: String): Seq[String] =
    Option(new java.io.File(s"$baseDir/$table").listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("snap_"))
      .map(_.getName).sorted

  /** Time-travel: read a specific historical snapshot by name. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
      baseDir: String, table: String, snapshot: String): DataFrame =
    spark.read.parquet(s"$baseDir/$table/$snapshot")
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
