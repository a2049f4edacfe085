package graft

import graft.vector.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness gate for the approximate vector paths (VERDICT r1 #5:
  * "q33 has no correctness signal"): measured recall of the
  * LSH-bucketed ANN against the exact brute-force baseline on the
  * real sf0.001 fixture — the same corpus/query split q32/q33 use. */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("lshTopK recall@3 vs bruteForceTopK >= 0.8 on sf0.001") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = pairs(VectorOps.bruteForceTopK(emb, queries, 3))
    val ann = pairs(VectorOps.lshTopK(emb, queries, 3))
    val recall = (exact & ann).size.toDouble / exact.size
    info(f"ANN recall@3 = $recall%.3f (${(exact & ann).size}/${exact.size})")
    assert(recall >= 0.8, f"ANN recall@3 $recall%.3f below 0.8 gate")
  }

  test("nearDupPairsLsh recall >= 0.9 vs exact near-dup pairs") {
    val emb = Tables.embeddings(spark, dir)
    val exact = pairs(VectorOps.nearDupPairs(emb, 0.45))
    val lsh = pairs(VectorOps.nearDupPairsLsh(emb, 0.45))
    assert(lsh.subsetOf(exact), "verify stage must make LSH ⊆ exact")
    val recall = if (exact.isEmpty) 1.0
      else (exact & lsh).size.toDouble / exact.size
    info(f"LSH near-dup recall = $recall%.3f (${lsh.size}/${exact.size})")
    assert(recall >= 0.9, f"LSH near-dup recall $recall%.3f below 0.9")
  }

  test("ivfTopK recall@3 vs bruteForceTopK >= 0.7 on sf0.001") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = pairs(VectorOps.bruteForceTopK(emb, queries, 3))
    val ivf = pairs(VectorOps.ivfTopK(emb, queries, 3))
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"IVF recall@3 = $recall%.3f (${(exact & ivf).size}/${exact.size})")
    assert(recall >= 0.7, f"IVF recall@3 $recall%.3f below 0.7 gate")
  }

  test("lshTopK candidates always score with exact cosine (rank sane)") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
    val ann = VectorOps.lshTopK(emb, queries, 3).collect()
    // per query: ranks are 1..n without gaps, cos non-increasing
    ann.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      val cosSeq = sorted.map(_.getDouble(2)).toSeq
      assert(cosSeq == cosSeq.sorted.reverse)
    }
  }
}
