package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The EventsEncodingSpec drift wall applied to the TPC-H date
  * columns: `lineitem.l_shipdate` must produce identical q143
  * (pricing summary) answers from every physical encoding a
  * regenerated fixture could plausibly carry — {INT64 epoch-nanos,
  * timestamp[us] NTZ, timestamp[us] UTC} — and the two
  * timestamp-typed encodings must KEEP the scan's predicate
  * pushdown (the lenient passthrough in [[Tables.rebuildIfNanos]]
  * exists precisely so the filter stays on the stored column). */
class TpchDateEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def writeEncoded(name: String)(
      transform: DataFrame => DataFrame,
      outputTimestampType: Option[String] = None): String = {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory(s"graft_tpch_$name").toString
    val base = spark.read.parquet(s"$dir/lineitem.parquet")
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      outputTimestampType.foreach(
        spark.conf.set("spark.sql.parquet.outputTimestampType", _))
      transform(base).coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/_stage")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val part = Files.list(Paths.get(s"$tmp/_stage")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(part), Paths.get(s"$tmp/lineitem.parquet"))
    tmp
  }

  private def q143Rows(d: String): Seq[String] =
    SparkEntry.queries("q143_pricing_summary")(spark, d)
      .collect().map(_.toString).toSeq

  private lazy val expected = q143Rows(dir)

  test("q143 answers are identical from INT64 epoch-nanos l_shipdate") {
    // the pre-r7 events shape applied to lineitem: nanos read as
    // LongType under nanosAsLong, rebuilt by the loader
    val tmp = writeEncoded("nanos")(df => df.withColumn("l_shipdate",
      unix_micros(col("l_shipdate").cast(TimestampType)) * lit(1000L)))
    assert(Tables.lineitem(spark, tmp).schema("l_shipdate").dataType ==
      TimestampType, "nanos must rebuild to TimestampType")
    assert(q143Rows(tmp) == expected)
  }

  test("q143 answers and pushdown are identical from timestamp[us] " +
      "UTC l_shipdate") {
    val tmp = writeEncoded("utcus")(
      df => df.withColumn("l_shipdate",
        col("l_shipdate").cast(TimestampType)),
      Some("TIMESTAMP_MICROS"))
    assert(q143Rows(tmp) == expected)
    val df = SparkEntry.queries("q143_pricing_summary")(spark, tmp)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(l_shipdate"),
      s"UTC-adjusted micros must keep the scan pushdown:\n$plan")
  }

  test("q143 keeps pushdown on the fixture's TIMESTAMP_NTZ encoding") {
    val df = SparkEntry.queries("q143_pricing_summary")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(l_shipdate"),
      s"NTZ passthrough must keep the scan pushdown:\n$plan")
  }

  test("an unsupported l_shipdate dtype fails loudly, not silently") {
    val tmp = writeEncoded("bad")(df => df.withColumn("l_shipdate",
      col("l_shipdate").cast(StringType)))
    val e = intercept[IllegalArgumentException] {
      Tables.lineitem(spark, tmp)
    }
    assert(e.getMessage.contains("unsupported physical read type"))
  }
}
