package graft

import graft.functions.SketchFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compact HLL_4 sketch family (SketchExpressions.scala): estimator
  * accuracy, union algebra, the wire-size claim vs the built-in
  * HLL_8 updatable image, and the partial→merge serialization path.
  */
class Hll4SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("small groups estimate exactly (coupon-sparse regime)") {
    // below the coupon threshold DataSketches stores raw coupons —
    // estimates are exact and the serialized form is tens of bytes
    val df = spark.range(1000)
      .select((col("id") % 20).as("g"), col("id").as("v"))
      .repartition(8)  // force partial+merge, serialize/deserialize
      .groupBy("g").agg(hll4Agg(col("v")).as("sk"))
      .select(col("g"), hll4Estimate(col("sk")).as("est"),
        octet_length(col("sk")).as("bytes"))
    val rows = df.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(1) == 50L, s"group ${r.getLong(0)}: ${r.getLong(1)}")
      assert(r.getInt(2) < 512, s"sparse sketch should be small: ${r.getInt(2)} B")
    }
  }

  test("dense estimate within 5% and compact HLL_4 at most half the built-in wire bytes") {
    val n = 200000L
    val df = spark.range(n).select(lit(1).as("g"), col("id").as("v"))
      .repartition(16)
      .groupBy("g").agg(
        hll4Agg(col("v")).as("sk4"),
        hll_sketch_agg(col("v")).as("sk8"))
      .select(
        hll4Estimate(col("sk4")).as("e4"),
        hll_sketch_estimate(col("sk8")).as("e8"),
        octet_length(col("sk4")).as("b4"),
        octet_length(col("sk8")).as("b8"))
    val r = df.collect()(0)
    val (e4, e8, b4, b8) = (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))
    assert(math.abs(e4 - n) <= 0.05 * n, s"e4=$e4 vs n=$n")
    // same lgK, same coupon hashing, HLL_4 register packing is
    // lossless — estimates agree with the built-in exactly
    assert(e4 == e8, s"HLL_4 ($e4) and built-in HLL_8 ($e8) must agree")
    // 4-bit registers halve the array; the lossless exception aux
    // adds a few % (measured 2100 B vs 4136 B at 200k distinct)
    assert(b4 <= (0.55 * b8).toInt,
      s"compact HLL_4 $b4 B should be ~half of HLL_8 updatable $b8 B")
  }

  test("union_agg over partitioned sketches equals sketch of the union") {
    // 64 disjoint shards of [0, 64k) unioned back together
    val shards = spark.range(64000)
      .select((col("id") % 64).as("shard"), col("id").as("v"))
      .repartition(8)
      .groupBy("shard").agg(hll4Agg(col("v")).as("sk"))
    val est = shards.repartition(8)
      .agg(hll4Estimate(hll4UnionAgg(col("sk"))).as("e"))
      .collect()(0).getLong(0)
    assert(math.abs(est - 64000L) <= 0.05 * 64000, s"union est $est")
  }

  test("pairwise union of disjoint sketches approximates the sum") {
    val a = spark.range(0, 30000).agg(hll4Agg(col("id")).as("ska"))
    val b = spark.range(30000, 60000).agg(hll4Agg(col("id")).as("skb"))
    val est = a.crossJoin(b)
      .select(hll4Estimate(hll4Union(col("ska"), col("skb"))).as("e"))
      .collect()(0).getLong(0)
    assert(math.abs(est - 60000L) <= 0.05 * 60000, s"pair union est $est")
  }

  test("nulls are ignored; empty group estimates zero") {
    val df = Seq((1, Some(10L)), (1, None), (1, Some(20L)), (2, None))
      .toDF("g", "v")
      .groupBy("g").agg(hll4Estimate(hll4Agg(col("v"))).as("e"))
    val got = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got(1) == 2L && got(2) == 0L)
  }

  test("string and binary inputs sketch distinct values") {
    val e = Seq("a", "b", "b", "c").toDF("s")
      .agg(hll4Estimate(hll4Agg(col("s"))).as("e"))
      .collect()(0).getLong(0)
    assert(e == 3L)
  }
}
