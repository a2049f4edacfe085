package graft

import graft.ops.Packing
import graft.sources.PartitionedParquetSink
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Packing → shard write composition: the training-shard layout
  * end-to-end — global offsets from the distributed prefix sum, docs
  * routed to their first window's shard, shards landing as hive
  * partitions readers can prune. */
class PackingShardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packed docs write one hive partition per 512-token shard, " +
      "offsets consistent, nothing lost") {
    val docs = (1 to 200).map(i => (i.toLong, 10L + i % 90))
      .toDF("doc_id", "n")
    val packed = Packing.packWindows(docs, "doc_id", "n", 512)
    val dir = Files.createTempDirectory("graft_shards").toString
    new PartitionedParquetSink(dir, Seq("bin_first"))
      .write(packed, "shards", SaveMode.Overwrite)

    // every shard from 0..maxBin exists as a prunable partition dir
    // hive partition columns come back type-inferred (int, not long)
    val back = spark.read.parquet(s"$dir/shards")
      .withColumn("bin_first", col("bin_first").cast("long"))
    val maxBin = back.agg(max("bin_first")).head().getLong(0)
    (0L to maxBin).foreach { b =>
      assert(new java.io.File(s"$dir/shards/bin_first=$b").exists(),
        s"missing shard $b")
    }
    // nothing lost, offsets globally consistent with a local replay
    assert(back.count() == 200)
    val rows = back.select("doc_id", "n", "offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var acc = 0L
    rows.foreach { case (id, n, off) =>
      assert(off == acc, s"offset of doc $id")
      acc += n
    }
    // each doc sits in the shard its offset dictates
    back.collect().foreach { r =>
      val off = r.getAs[Long]("offset")
      assert(r.getAs[Long]("bin_first") == off / 512)
    }
    Caching.releaseAll()
  }
}
