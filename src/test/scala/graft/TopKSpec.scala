package graft

import graft.ops.{ScoredId, TopK, TopKAgg}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap grouped top-k must agree EXACTLY with the window
  * row_number() formulation it replaces (ties: ord DESC, id ASC),
  * and must plan as a partial-aggregating ObjectHashAggregate with
  * no Window and no sort of the input relation. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("c_nationkey").cast("long").as("g"),
        col("rk").cast("long").as("rank"),
        col("c_custkey").as("id"), col("c_acctbal").as("ord"))
  }

  private def aggTopK(k: Int) = {
    val f = TopK.topk(k)
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("g"))
      .agg(f(col("c_acctbal").cast("double"), col("c_custkey")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("id"), col("e.ord").as("ord"))
  }

  test("agg top-k equals window row_number top-k exactly (k=1,3,7)") {
    for (k <- Seq(1, 3, 7)) {
      val exp = windowTopK(k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val got = aggTopK(k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == exp, s"k=$k mismatch")
    }
  }

  test("k larger than every group returns whole groups, ordered") {
    val n = Tables.customer(spark, dir).count().toInt
    val got = aggTopK(n + 5)
    assert(got.count() == n)
    val exp = windowTopK(n + 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == exp)
  }

  test("plan: ObjectHashAggregate partial+final, no Window, no sort " +
      "of the corpus") {
    val df = aggTopK(3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(!plan.contains("Window"), "top-k agg must not plan a window")
    // partial + final instances of the aggregate
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "map-side partial aggregation missing")
  }

  test("exact-tie scores break to the smaller id (portable total order)") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 3L), (1L, 5.0, 7L),
      (1L, 4.0, 1L)).toDF("g", "ord", "id")
    val f = TopK.topk(2)
    val got = df.groupBy(col("g"))
      .agg(f(col("ord"), col("id")).as("top"))
      .select(explode(col("top.id")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 7L))
  }

  test("merge law: reduce-then-merge equals any interleaving (unit)") {
    val agg = new TopKAgg(3)
    val xs = Seq(ScoredId(1, 1), ScoredId(9, 2), ScoredId(9, 1),
      ScoredId(3, 9), ScoredId(7, 4), ScoredId(7, 5), ScoredId(2, 2))
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    for (cut <- 0 to xs.length) {
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged.toSeq == whole.toSeq, s"cut=$cut")
    }
    assert(whole.map(_.id).toSeq == Seq(1L, 2L, 4L))
  }
}
