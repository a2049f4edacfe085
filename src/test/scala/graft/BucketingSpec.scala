package graft

import graft.sources.Bucketing
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: both sides pre-shuffled at write time
  * into the same bucket count on the join key → the equi-join plans
  * with NO Exchange (the shuffle was paid once, at write). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("equi-join of co-bucketed tables plans without any Exchange") {
    Bucketing.writeBucketed(Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 4)
    val joined = Bucketing.readTable(spark, "b_lineitem").hint("merge")
      .join(Bucketing.readTable(spark, "b_orders"),
        $"l_orderkey" === $"o_orderkey")
    val n = joined.count()
    assert(n == Tables.lineitem(spark, dir).count()) // FK join, 1:1
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(500))
    assert(!plan.contains("Exchange"),
      "bucketed join must not shuffle:\n" + plan.take(800))
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val agg = Bucketing.readTable(spark, "b_lineitem")
      .groupBy("l_orderkey").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "bucketed group-by must not shuffle:\n" + plan.take(800))
  }
}
