package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction: rewrite a fragmented parquet directory
  * (the debris every streaming/incremental writer leaves behind —
  * thousands of KB-sized files whose per-file open/footer/task cost
  * dominates the scan) into ⌈total bytes / target⌉ right-sized
  * files. The file LISTING is driver-side metadata only (namenode
  * listing, no data reads); the data itself moves through one
  * executor-side shuffle.
  *
  * Two modes:
  *  - unsorted: `repartition(n)` round-robin — cheapest, destroys
  *    any ordering;
  *  - sort-preserving: `repartitionByRange(n, keys) +
  *    sortWithinPartitions` — same shuffle count, and the compacted
  *    files keep disjoint key ranges so min/max stats pruning
  *    (see [[ZOrder]]) survives compaction.
  * Writes to a NEW directory, never in place — the swap is the
  * caller's (atomic-pointer or metastore) concern, same seam as
  * [[UpsertParquetSink]].
  */
object Compaction {

  /** @return number of output files planned. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, sortCols: Seq[String] = Nil): Int = {
    val sizes = new java.io.File(inDir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.length())
    require(sizes.nonEmpty, s"no parquet part files under $inDir")
    val n = math.max(1,
      math.ceil(sizes.sum.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    val out =
      if (sortCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    out.write.mode(SaveMode.Overwrite).parquet(outDir)
    n
  }
}
