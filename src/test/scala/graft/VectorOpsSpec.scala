package graft

import graft.vector.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine: orthogonal 0, parallel 1, known angle") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 1f), Seq(2f, 2f)),
      (Seq(1f, 0f), Seq(1f, 1f))
    ).toDF("a", "b")
      .select(round(VectorOps.cosine(
        VectorOps.toDouble(col("a")), VectorOps.toDouble(col("b"))), 6)
        .as("c"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    assert(got(0) == 0.0 && got(1) == 1.0)
    assert(math.abs(got(2) - 0.707107) < 1e-6)
  }

  test("bruteForceTopK: nearest neighbor ranking on a known corpus") {
    val corpus = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f))
    ).toDF("vec_id", "embedding")
    val got = VectorOps.bruteForceTopK(
      corpus, corpus.filter($"vec_id" === 0L), 2)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 1), (2L, 2))) // closest first, -x last
  }

  test("lshSignature is deterministic across evaluations") {
    val df = Seq((0L, Seq(0.5f, -0.25f, 1f)), (1L, Seq(0.5f, -0.25f, 1f)))
      .toDF("vec_id", "embedding")
      .select(VectorOps.lshSignature(
        VectorOps.toDouble(col("embedding")), 16).as("sig"))
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
  }

  test("nearDupPairs finds duplicated vector only") {
    val df = Seq(
      (0L, Seq(1f, 2f, 3f)), (1L, Seq(1f, 2f, 3f)), (2L, Seq(-3f, 1f, -2f))
    ).toDF("vec_id", "embedding")
    val got = VectorOps.nearDupPairs(df, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L)))
  }
}
