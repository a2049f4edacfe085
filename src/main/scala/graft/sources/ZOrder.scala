package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order clustered parquet write: interleave the bits of several
  * normalized columns into one space-filling-curve key, range-
  * partition + sort the data on that key, and write — so the rows of
  * every output file occupy a small HYPER-RECTANGLE of the
  * multi-column space instead of a thin slab of the leading sort
  * column. Per-file (and per-row-group) min/max stats then prune
  * selective filters on ANY clustered column: a linear
  * `orderBy(x, y)` layout skips perfectly on `x` and not at all on
  * `y`; z-order skips ~sqrt-fraction on each of the two.
  *
  * Scale notes: the only extra cost over a plain sorted write is one
  * min/max agg for normalization bounds (negligible next to the
  * rewrite itself; a production table keeps these in footer/catalog
  * stats) and the z-key arithmetic, which is pure codegen'd
  * bit-twiddling (shift/and/or — no UDF). The shuffle is the same
  * single range-exchange any sorted write pays. In open-source Spark
  * the skipping is realized by the parquet reader's row-group
  * stats + pushed predicates; table formats with file-level stats
  * (Delta/Iceberg) additionally skip whole files — both benefit
  * identically from this clustering. The reference has no layout
  * tier at all (it writes unsorted parquet, cleaning.py:20); this is
  * engine infrastructure for multi-dimension scan-heavy tables.
  */
object ZOrder {

  /** Interleave `bits` bits of each column (already normalized to
    * `[0, 2^bits)`) into one z-value. Column j contributes bit b to
    * output position `b*k + (k-1-j)` — pure shift/mask/or, codegen.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1 && k * bits <= 63, s"z-value width ${k * bits} > 63")
    val terms = for {
      b <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)),
      b * k + (k - 1 - j))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Normalize a numeric column to an integer rank in `[0, 2^bits)`
    * given its min/max. Constant span → rank 0 (degenerate but
    * total). */
  def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    val span = if (hi > lo) hi - lo else 1.0
    least(lit(buckets),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(buckets.toDouble)))
      .cast("long")
  }

  /** Write `df` to `path` clustered on `cols` by z-order into
    * `numFiles` range partitions (one file each, sorted by z within).
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    // one tiny agg for normalization bounds (production: footer stats)
    val exprs = cols.flatMap(c => Seq(min(col(c)).cast("double"),
      max(col(c)).cast("double")))
    val bounds = df.agg(exprs.head, exprs.tail: _*).head()
    val normed = cols.zipWithIndex.map { case (c, i) =>
      normalize(col(c), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1),
        bits)
    }
    df.withColumn("__z", zValue(normed, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min,max] of `statCols` for every parquet part file
    * under `path` — the stats a file-skipping planner would consult.
    * Driver-side dev/audit helper (numFiles small by construction).
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
      statCols: Seq[String]): Seq[(String, Seq[(Double, Double)])] = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted.toSeq
    val exprs = statCols.flatMap(c => Seq(min(col(c)).cast("double"),
      max(col(c)).cast("double")))
    files.map { f =>
      val r = spark.read.parquet(f).agg(exprs.head, exprs.tail: _*).head()
      f -> statCols.indices.map(i =>
        (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
    }
  }

  /** How many of `stats` overlap the rectangle `ranges` (per-column
    * [lo,hi]) — i.e. files a stats-based planner could NOT skip. */
  def overlapping(stats: Seq[(String, Seq[(Double, Double)])],
      ranges: Seq[(Double, Double)]): Int =
    stats.count { case (_, s) =>
      s.zip(ranges).forall { case ((mn, mx), (lo, hi)) =>
        mx >= lo && mn <= hi
      }
    }
}
