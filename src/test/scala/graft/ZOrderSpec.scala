package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Z-order layout tier: the z-value bit math, content preservation
  * of the clustered write, and the point of the whole exercise — a
  * measured file-skipping advantage on the NON-leading dimension
  * versus a linear sort layout. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 64×64 grid, one row per (x, y) — every file of a 16-file z-order
  // write should cover one aligned 16×16 tile of the grid.
  private def grid = {
    val rows = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, x * 64L + y)
    rows.toDF("x", "y", "payload").repartition(8) // scrambled input
  }

  test("zValue interleaves bits (known values, 2 and 3 columns)") {
    val df = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L),
      (3L, 3L, 3L)).toDF("a", "b", "c")
    val z2 = df.select(ZOrder.zValue(Seq(col("a"), col("b")), 2).as("z"))
      .as[Long].collect()
    // bit layout (k=2): out[2b+1] = a's bit b, out[2b] = b's bit b
    assert(z2.toSeq == Seq(0L, 2L, 1L, 15L))
    val z3 = df.select(
      ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .as[Long].collect()
    assert(z3.toSeq == Seq(0L, 4L, 2L, 63L))
  }

  test("normalize maps [lo,hi] onto [0, 2^bits) monotonically") {
    val df = Seq(0.0, 2.5, 5.0, 10.0).toDF("v")
    val got = df.select(ZOrder.normalize(col("v"), 0.0, 10.0, 2).as("r"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 3L)) // hi itself clamps into bucket 3
    assert(got.forall(r => r >= 0 && r <= 3))
  }

  test("writeZOrdered preserves content exactly") {
    val dir = Files.createTempDirectory("graft_z").toString + "/t"
    ZOrder.writeZOrdered(grid, Seq("x", "y"), dir, numFiles = 16, bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() == 64 * 64)
    assert(back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
    assert(back.columns.sorted.toSeq == Seq("payload", "x", "y"))
  }

  test("z-order skips files on the non-leading dimension; linear cannot") {
    val base = Files.createTempDirectory("graft_zcmp").toString
    ZOrder.writeZOrdered(grid, Seq("x", "y"), s"$base/z", numFiles = 16,
      bits = 6)
    // linear layout: globally sorted by (x, y) into the same 16 files
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.parquet(s"$base/lin")

    val zStats = ZOrder.fileStats(spark, s"$base/z", Seq("x", "y"))
    val lStats = ZOrder.fileStats(spark, s"$base/lin", Seq("x", "y"))
    assert(zStats.size == 16 && lStats.size == 16)

    // narrow band on y (the non-leading column): y ∈ [10, 13]
    val band = Seq((0.0, 63.0), (10.0, 13.0))
    val zHit = ZOrder.overlapping(zStats, band)
    val lHit = ZOrder.overlapping(lStats, band)
    // every linear file spans all of y; z-order files are contiguous
    // z-ranges ≈ 16×16 tiles (range-partition boundaries come from
    // sampling, so allow a file to straddle a tile edge) — only the
    // tile-row containing y∈[10,13] plus stragglers can overlap
    assert(lHit == 16, s"linear layout should overlap all files, got $lHit")
    assert(zHit <= 8, s"z-order should prune most files, got $zHit/16")

    // and on the leading column both layouts skip: x ∈ [10, 13]
    val xband = Seq((10.0, 13.0), (0.0, 63.0))
    assert(ZOrder.overlapping(zStats, xband) <= 8)
    assert(ZOrder.overlapping(lStats, xband) <= 4)
  }
}
