package graft

import org.scalatest.funsuite.AnyFunSuite

/** P7 cache surface: the composite query must fan its three
  * aggregates out of ONE cached relation — a single parquet scan
  * feeding an InMemoryRelation with three InMemoryTableScan
  * consumers (the reference's one-scan-many-consumers shape,
  * yellow_taxi_etl.py:95). */
class CachedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q36 plans one InMemoryRelation with three cache consumers") {
    val df = SparkEntry.queries("q36_cached_multi_agg")(
      spark, "/root/testdata/sf0.001")
    df.collect() // materialize the cache + final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      "aggregates must read the cached relation")
    // AQE's string rendering shows initial + final plans, so count
    // is a lower bound; the sharing assertion below is the real gate
    val scans = "InMemoryTableScan".r.findAllIn(plan).size
    assert(scans >= 3, s"expected >=3 cache consumers, saw $scans")
    // exactly one distinct cached relation backs them
    val rels = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cacheBuilder
    }
    assert(rels.distinct.size == 1, "all consumers share one cache")
  }

  test("q36 slices agree with directly-computed aggregates") {
    val df = SparkEntry.queries("q36_cached_multi_agg")(
      spark, "/root/testdata/sf0.001")
    val byType = df.filter(org.apache.spark.sql.functions.col("slice")
      === "by_type").collect()
    val direct = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byType.foreach { r =>
      assert(r.getAs[Long]("n") == direct(r.getAs[String]("key")))
    }
  }
}
