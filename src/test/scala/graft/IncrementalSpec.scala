package graft

import graft.dedup.Incremental
import graft.sources.UpsertParquetSink
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Incremental dedup: batch-vs-index semantics, the broadcast-only
  * plan shape (the corpus index must never shuffle), and the full
  * nightly loop through UpsertParquetSink — day 2 sees day 1's
  * merged index entries. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def day1 = Seq(
    (1L, "the quick brown fox"),
    (2L, "jumps over the lazy dog"),
    (3L, "the quick brown fox") // within-corpus dup already indexed
  ).toDF("doc_id", "text")

  private def day2 = Seq(
    (10L, "the quick brown fox"),     // dup of indexed doc 1 → dropped
    (11L, "a genuinely new document"),
    (12L, "a genuinely new document"), // within-batch dup → keep 11
    (13L, "another fresh one")
  ).toDF("doc_id", "text")

  test("batch dedup against index: indexed dups dropped, " +
      "within-batch keep-first, new entries emitted") {
    val index = graft.dedup.Dedup.exactGroups(day1, "doc_id", "text")
      .select($"fingerprint", $"keep_id")
    val (survivors, entries) =
      Incremental.dedupAgainstIndex(day2, "doc_id", "text", index)
    assert(survivors.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 13L))
    assert(entries.columns.toSeq == Seq("fingerprint", "keep_id"))
    assert(entries.select("keep_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 13L))
  }

  test("index side never shuffles: both joins broadcast the batch side") {
    val index = graft.dedup.Dedup.exactGroups(day1, "doc_id", "text")
      .select($"fingerprint", $"keep_id")
    val (survivors, _) =
      Incremental.dedupAgainstIndex(day2, "doc_id", "text", index)
    survivors.collect()
    val plan = survivors.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus index must not be shuffle-joined, plan:\n$plan")
  }

  test("nightly loop through UpsertParquetSink: day 2 is deduped " +
      "against day 1's merged entries") {
    val base = Files.createTempDirectory("graft_inc").toString
    val sink = new UpsertParquetSink(base, Seq("fingerprint"))
    // day 1: empty index → everything except the within-batch dup lands
    val empty = Seq.empty[(String, Long)].toDF("fingerprint", "keep_id")
    val (_, e1) = Incremental.dedupAgainstIndex(day1, "doc_id", "text", empty)
    sink.write(e1, "fp_index", SaveMode.Append)
    assert(UpsertParquetSink.read(spark, base, "fp_index").count() == 2)
    // day 2 against the persisted index
    val idx = UpsertParquetSink.read(spark, base, "fp_index")
    val (s2, e2) = Incremental.dedupAgainstIndex(day2, "doc_id", "text", idx)
    assert(s2.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(11L, 13L))
    sink.write(e2, "fp_index", SaveMode.Append)
    // index now holds all four unique fingerprints; a day-2 re-run
    // (the retry/idempotence case) drops everything
    val idx2 = UpsertParquetSink.read(spark, base, "fp_index")
    assert(idx2.count() == 4)
    val (s3, _) = Incremental.dedupAgainstIndex(day2, "doc_id", "text", idx2)
    assert(s3.isEmpty)
  }
}
