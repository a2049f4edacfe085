package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** S2: multi-file glob scan with union-compatible footer merge
  * (cleaning.py:7 parity — 12 monthly files read as one relation). */
class GlobScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("glob reads multiple files and merges union-compatible schemas") {
    val dir = Files.createTempDirectory("graft_glob").toString
    // month 1: (id, fare); month 2 adds a column (id, fare, tip)
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "fare")
      .write.parquet(s"$dir/m1.parquet")
    Seq((3L, 30.0, 1.5), (4L, 40.0, 2.5)).toDF("id", "fare", "tip")
      .write.parquet(s"$dir/m2.parquet")
    val got = Tables.glob(spark, s"$dir/*.parquet")
    assert(got.columns.toSeq.sorted == Seq("fare", "id", "tip"))
    assert(got.count() == 4)
    // rows from the older file surface NULL for the added column
    val tips = got.orderBy("id").collect()
      .map(r => if (r.isNullAt(r.fieldIndex("tip"))) None
        else Some(r.getAs[Double]("tip")))
    assert(tips.toSeq == Seq(None, None, Some(1.5), Some(2.5)))
  }

  test("glob over a homogeneous directory behaves like a plain scan") {
    val dir = Files.createTempDirectory("graft_glob2").toString
    val src = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang")
    src.limit(100).write.parquet(s"$dir/part1.parquet")
    src.limit(50).write.parquet(s"$dir/part2.parquet")
    val got = Tables.glob(spark, s"$dir/*.parquet")
    assert(got.count() == 150)
    assert(got.columns.toSeq.sorted == Seq("doc_id", "lang"))
  }
}
