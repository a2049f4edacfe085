package graft

import graft.sources.{Compaction, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Compaction: file count collapses to the planned target, content
  * survives exactly, and the sort-preserving mode keeps disjoint key
  * ranges so stats pruning still works afterwards. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partFiles(dir: String) =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))

  test("fragmented dir compacts to the planned file count, content exact") {
    val base = Files.createTempDirectory("graft_cmp").toString
    val df = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(64).write.parquet(s"$base/frag")
    assert(partFiles(s"$base/frag").length == 64)
    val total = partFiles(s"$base/frag").map(_.length()).sum
    val n = Compaction.compact(spark, s"$base/frag", s"$base/out",
      targetBytes = total / 4)
    assert(n == 5 || n == 4, s"planned $n") // ceil(total/(total/4))
    assert(partFiles(s"$base/out").length == n)
    val back = spark.read.parquet(s"$base/out")
    assert(back.count() == 5000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("sort-preserving compaction keeps disjoint key ranges") {
    val base = Files.createTempDirectory("graft_cmps").toString
    val df = (1 to 4096).map(i => (i.toLong, i % 7)).toDF("id", "v")
    df.repartition(32).write.parquet(s"$base/frag")
    val total = partFiles(s"$base/frag").map(_.length()).sum
    Compaction.compact(spark, s"$base/frag", s"$base/out",
      targetBytes = total / 4, sortCols = Seq("id"))
    val stats = ZOrder.fileStats(spark, s"$base/out", Seq("id"))
      .map(_._2.head).sortBy(_._1)
    assert(stats.size >= 2)
    // consecutive files must not overlap in id — pruning survives
    stats.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"overlapping compacted files: hi=$hi1 lo=$lo2")
      case _ =>
    }
  }
}
