package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end in a deterministic
  * order and slice the token stream into fixed-capacity training
  * windows — the data layout step before LLM training (every doc
  * gets a global token offset; a doc whose span crosses a window
  * boundary "straddles" and is split at training time).
  *
  * The core primitive is a DISTRIBUTED prefix sum. A naive
  * `Window.orderBy(order)` with no partition key computes the running
  * total in ONE task — the classic single-partition collapse. Instead:
  * range-repartition on the order column (partition i holds strictly
  * smaller keys than i+1), take one tiny pass for per-partition
  * totals, prefix-scan those on the driver (numPartitions values),
  * and broadcast the per-partition base offsets into a
  * partition-local window — every stage parallel, the only global
  * object is the numPartitions-sized offset map. */
object Packing {

  /** Add `offset` = total of `lenCol` over all rows strictly before
    * each row in `orderCol` order. One range shuffle + one scan.
    *
    * `tieCols` complete the order when `orderCol` is not unique:
    * range partitioning co-locates equal keys, but the
    * partition-local window's tied rows would otherwise take
    * whatever intra-partition order the shuffle produced — offsets
    * (and packWindows' bin/straddle flags) would differ run to run.
    * Callers with a unique orderCol (ids, distinct values) need
    * nothing. */
  def withGlobalOffsets(df: DataFrame, orderCol: String, lenCol: String,
      partitions: Int = 0, tieCols: Seq[String] = Nil): DataFrame =
    withGlobalOffsetsMulti(df, orderCol, Seq(lenCol -> "offset"),
      partitions, tieCols)

  /** [[withGlobalOffsets]] for SEVERAL length columns at once: ONE
    * range shuffle, ONE per-partition-totals job, ONE window pass
    * emitting every requested running sum (`lenCol -> outCol`
    * pairs). A caller needing k prefix sums over the same order
    * (q268's rank / cumulative-tokens / cumulative-vocab trio) pays
    * one input scan instead of k nested ones — the window aggs share
    * a single Window operator because they share the window spec. */
  def withGlobalOffsetsMulti(df: DataFrame, orderCol: String,
      lens: Seq[(String, String)], partitions: Int = 0,
      tieCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    val nParts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    // pin the range-partition id as a REAL column at scan time:
    // spark_partition_id() re-evaluated after any later shuffle (the
    // window's own exchange) would report the post-shuffle id, not
    // the range id the driver prefix was computed over
    val ranged = graft.Caching.retain(
      df.repartitionByRange(nParts, col(orderCol))
        .withColumn("__pid", spark_partition_id())
        .persist())
    // per-partition totals for EVERY length column in one job,
    // prefix-scanned on the driver: a numPartitions-sized plan
    // constant, not a data-sized one
    val totals = ranged
      .groupBy(col("__pid"))
      .agg(sum(col(lens.head._1)).as("__t0"),
        lens.tail.zipWithIndex.map { case ((c, _), i) =>
          sum(col(c)).as(s"__t${i + 1}") }: _*)
      .collect()
      .map(r => r.getInt(0) -> lens.indices.map(i => r.getLong(i + 1)))
      .toMap
    val w = Window.partitionBy(col("__pid"))
      .orderBy((orderCol +: tieCols).map(col): _*)
    val out = lens.zipWithIndex.foldLeft(ranged) {
      case (acc, ((lenCol, outCol), i)) =>
        val bases = (0 until nParts).scanLeft(0L) { (b, pid) =>
          b + totals.get(pid).map(_(i)).getOrElse(0L)
        }
        acc.withColumn(outCol,
          element_at(typedLit(bases.dropRight(1)), col("__pid") + 1) +
            coalesce(sum(col(lenCol))
              .over(w.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
    }
    out.drop("__pid")
  }

  /** Pack documents into `capacity`-token windows: per doc, its
    * global offset, first/last window index, and whether it straddles
    * a boundary. */
  def packWindows(df: DataFrame, orderCol: String, lenCol: String,
      capacity: Int): DataFrame =
    withGlobalOffsets(df, orderCol, lenCol)
      .withColumn("bin_first", (col("offset") / capacity).cast("long"))
      .withColumn("bin_last",
        ((col("offset") + col(lenCol) - 1) / capacity).cast("long"))
      .withColumn("straddles", col("bin_first") =!= col("bin_last"))
}
