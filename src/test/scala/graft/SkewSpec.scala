package graft

import graft.ops.Skew
import org.scalatest.funsuite.AnyFunSuite

/** Salted two-phase aggregation must be exactly count-preserving and
  * sum-preserving (up to double addition order) versus the direct
  * groupBy it replaces under skew. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("saltedCountSum equals direct groupBy on a skewed table") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, dir) // event_type is low-cardinality/hot
    val salted = Skew.saltedCountSum(events, Seq("event_type"), "value")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val direct = events.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("value").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == direct(k)._1, s"count for $k")
      // double addition is reorderable only up to rounding
      assert(math.abs(s - direct(k)._2) <= 1e-6 * math.abs(s).max(1.0),
        s"sum for $k")
    }
  }
}
