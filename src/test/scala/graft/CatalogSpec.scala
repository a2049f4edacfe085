package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-level invariants: every query runs on sf0.001 and returns
  * rows; every oracle key exists in the query map; the flagship entry
  * is non-empty (the driver's t1 smoke). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("entry (driver t1 smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows on sf0.001") {
      assert(fn(spark, dir).count() > 0)
    }
  }
}
