package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness gates for sketch/decorrelation queries that the
  * DuckDB oracle cannot hash-compare. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q43 HLL estimate within 5% of exact distinct per group") {
    val approx = SparkEntry.queries("q43_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"$k: approx $a vs exact $e")
    }
  }

  test("q42 decorrelates: one aggregate + join, no per-row subquery") {
    val df = SparkEntry.queries("q42_correlated_subquery")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // decorrelated shape: the orders average appears as a joined
    // aggregate, and the executed plan carries no subquery node
    assert(plan.contains("HashAggregate"))
    assert(!plan.toLowerCase.contains("subquery"),
      "correlated subquery should be rewritten to aggregate+join")
  }
}
