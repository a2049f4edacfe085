package graft

import graft.sources.{ConsoleSink, JdbcSink, ParquetSink, Sinks}
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** S3-S6 sink surface: parquet round-trip, console, JDBC against the
  * in-process fake driver (the REAL Spark JDBC write path: existence
  * probe, CREATE TABLE, per-partition batched INSERTs, and
  * DROP+recreate on overwrite), plus the reference's per-sink mode
  * plumbing including the fare_anomalies always-overwrite quirk
  * (/root/reference/yellow_taxi_etl.py:207). */
class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    .toDF("id", "name", "score")

  test("ParquetSink: overwrite then append round-trips rows") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val sink = new ParquetSink(dir)
    sink.write(sample, "t", SaveMode.Overwrite)
    sink.write(sample, "t", SaveMode.Append)
    val got = spark.read.parquet(s"$dir/t")
    assert(got.count() == 6)
    assert(got.columns.toSeq.sorted == Seq("id", "name", "score"))
  }

  test("PartitionedParquetSink: hive layout + partition pruning at read") {
    val dir = Files.createTempDirectory("graft_psink").toString
    val byName = new graft.sources.PartitionedParquetSink(dir, Seq("name"))
    byName.write(sample, "t", SaveMode.Overwrite)
    // hive directory layout
    assert(new java.io.File(s"$dir/t/name=a").exists())
    // a partition-column filter prunes to one directory: the scan
    // shows it under PartitionFilters and reads a single row with
    // no data-file filter needed
    val q = spark.read.parquet(s"$dir/t").filter($"name" === "b")
    assert(q.collect().map(_.getAs[Long]("id")).toSeq == Seq(2L))
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PartitionFilters"))
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(formatted).map(_.group(1)).getOrElse("")
    assert(pf.contains("name"), s"partition filter missing: $pf")
  }

  test("TextSources: JSONL and CSV round-trip documents with explicit " +
      "schema; corrupt JSONL rows surface, not vanish") {
    import graft.sources.TextSources
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("lang"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_txt").toString
    TextSources.writeJsonl(docs, s"$dir/j")
    val j = TextSources.readJsonl(spark, s"$dir/j", schema)
    assert(j.count() == docs.count())
    assert(j.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    TextSources.writeCsv(docs, s"$dir/c")
    val c = TextSources.readCsv(spark, s"$dir/c", schema)
    assert(c.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // a malformed line must land as nulls + _corrupt_record, not drop
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/bad.jsonl"),
      "{\"doc_id\": 1, \"text\": \"ok\", \"lang\": \"en\"}\nnot json at all\n"
        .getBytes("UTF-8"))
    val withCorrupt = schema.add("_corrupt_record", StringType)
    // Spark refuses plans touching ONLY _corrupt_record on raw
    // files — materialize the parsed rows first
    val bad = TextSources.readJsonl(spark, s"$dir/bad.jsonl", withCorrupt)
      .collect()
    assert(bad.length == 2)
    assert(bad.count(r => !r.isNullAt(r.fieldIndex("_corrupt_record"))) == 1)
  }

  test("UpsertParquetSink: new keys insert, existing keys replaced, " +
      "crash-safe pointer swap") {
    import graft.sources.UpsertParquetSink
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val sink = new UpsertParquetSink(dir, Seq("k"))
    sink.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t",
      SaveMode.Append)
    sink.write(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), "t",
      SaveMode.Append)
    val got = UpsertParquetSink.read(spark, dir, "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    // overwrite semantics reset the snapshot
    sink.write(Seq((9L, "z")).toDF("k", "v"), "t", SaveMode.Overwrite)
    assert(UpsertParquetSink.read(spark, dir, "t")
      .collect().map(_.getLong(0)).toSeq == Seq(9L))
    // prior snapshots remain on disk until vacuumed — pointer swap is
    // the only mutation, so a reader never sees a half-written merge
    val snaps = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.startsWith("snap_"))
    assert(snaps.length >= 3)
  }

  test("UpsertParquetSink: time-travel reads a pre-merge snapshot") {
    import graft.sources.UpsertParquetSink
    val dir = java.nio.file.Files.createTempDirectory("graft_tt").toString
    val sink = new UpsertParquetSink(dir, Seq("k"))
    sink.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t",
      SaveMode.Append)
    sink.write(Seq((2L, "B")).toDF("k", "v"), "t", SaveMode.Append)
    val snaps = UpsertParquetSink.snapshots(dir, "t")
    assert(snaps.length == 2)
    // history: the older snapshot still shows the pre-merge value
    val old = UpsertParquetSink.readSnapshot(spark, dir, "t", snaps.head)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old == Map(1L -> "a", 2L -> "b"))
    val cur = UpsertParquetSink.read(spark, dir, "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cur == Map(1L -> "a", 2L -> "B"))
  }

  test("ConsoleSink: show() does not throw") {
    new ConsoleSink(5).write(sample, "t", SaveMode.Overwrite)
  }

  private def jdbcSink =
    new JdbcSink(FakeJdbcStore.URL, "user", "pw", classOf[FakeJdbcDriver].getName)

  test("JdbcSink: create-table DDL + batched inserts reach the database") {
    FakeJdbcStore.clear()
    jdbcSink.write(sample, "trips", SaveMode.Overwrite)
    assert(FakeJdbcStore.ddlSnapshot.exists(s =>
      s.toUpperCase.startsWith("CREATE TABLE") && s.contains("trips")))
    val rows = FakeJdbcStore.rows("trips")
    assert(rows.size == 3)
    assert(rows.map(r => (r(0), r(1), r(2))).toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
  }

  test("JdbcSink: append adds rows, overwrite drops and recreates") {
    FakeJdbcStore.clear()
    jdbcSink.write(sample, "t2", SaveMode.Overwrite)
    jdbcSink.write(sample, "t2", SaveMode.Append)
    assert(FakeJdbcStore.rows("t2").size == 6)
    jdbcSink.write(sample, "t2", SaveMode.Overwrite)
    assert(FakeJdbcStore.rows("t2").size == 3)
    assert(FakeJdbcStore.ddlSnapshot.exists(
      _.toUpperCase.startsWith("DROP TABLE")))
  }

  test("writeAll: fare_anomalies is always overwritten in append runs") {
    FakeJdbcStore.clear()
    val tables = Seq("demand_heatmap" -> sample, "fare_anomalies" -> sample)
    Sinks.writeAll(tables, jdbcSink, overwrite = true)
    Sinks.writeAll(tables, jdbcSink, overwrite = false) // append run
    assert(FakeJdbcStore.rows("demand_heatmap").size == 6) // appended
    assert(FakeJdbcStore.rows("fare_anomalies").size == 3) // re-overwritten
  }
}
