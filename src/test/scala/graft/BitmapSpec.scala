package graft

import graft.functions.BitmapFunctions._
import graft.functions.BitmapUtil
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Roaring64 bitmap family (BitmapExpressions.scala) — the exact
  * distinct-set layer behind q196/q346's reach tiers. The aggregates
  * are set algebra, so every test pins EXACT equality against the
  * relational distinct, including through the partial→merge
  * serialization path (repartition forces it).
  */
class BitmapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bitmap64_agg cardinality equals count(distinct) through partial/merge") {
    // values collide across rows (id % 97) so dedup is exercised;
    // repartition(16) forces partial buffers + serialize + merge
    val df = spark.range(100000)
      .select((col("id") % 13).as("g"), (col("id") % 97 * 1000003L).as("v"))
      .repartition(16)
    val got = df.groupBy("g").agg(bitmap64Card(bitmap64Agg(col("v"))).as("n"))
    val want = df.groupBy("g").agg(count_distinct(col("v")).as("n"))
    val g = got.orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    val w = want.orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(g.sameElements(w))
  }

  test("bitmap64_or_agg equals the distinct union of member sets") {
    // per-group bitmaps, then OR across groups == global distinct
    val df = spark.range(50000)
      .select((col("id") % 32).as("g"), (col("id") % 7919).as("v"))
      .repartition(8)
    val per = df.groupBy("g").agg(bitmap64Agg(col("v")).as("bm"))
    val orAll = per.repartition(8)
      .agg(bitmap64Card(bitmap64OrAgg(col("bm"))).as("n"))
      .collect()(0).getLong(0)
    val want = df.select(col("v")).distinct().count()
    assert(orAll == want, s"or_agg $orAll vs distinct $want")
  }

  test("bitmap64_union_card is |a UNION b| exactly (overlapping sets)") {
    val spark2 = spark
    import spark2.implicits._
    val a = (1L to 1000L).toDF("v").agg(bitmap64Agg(col("v"))).collect()(0)
      .getAs[Array[Byte]](0)
    val b = (500L to 1500L).toDF("v").agg(bitmap64Agg(col("v"))).collect()(0)
      .getAs[Array[Byte]](0)
    val card = Seq((a, b)).toDF("a", "b")
      .select(bitmap64UnionCard(col("a"), col("b"))).collect()(0).getLong(0)
    assert(card == 1500L)
  }

  test("negative and huge longs round-trip (full 64-bit domain)") {
    val vals = Seq(Long.MinValue, -1L, 0L, 1L, Int.MaxValue.toLong,
      1L << 40, Long.MaxValue)
    val spark2 = spark
    import spark2.implicits._
    val bytes = vals.toDF("v").repartition(3)
      .agg(bitmap64Agg(col("v"))).collect()(0).getAs[Array[Byte]](0)
    val bm = BitmapUtil.fromBytes(bytes)
    assert(bm.getLongCardinality == vals.length)
    vals.foreach(v => assert(bm.contains(v), s"missing $v"))
  }

  test("bitmap64_explode round-trips the distinct set in ascending order") {
    val spark2 = spark
    import spark2.implicits._
    val vals = Seq(5L, -3L, 5L, 0L, 1L << 33, -3L, 7L)
    val exploded = vals.toDF("v").repartition(3)
      .agg(bitmap64Agg(col("v")).as("bm"))
      .select(bitmap64Explode(col("bm")).as("v"))
      .collect().map(_.getLong(0))
    // Roaring64Bitmap iterates unsigned-ascending; set equality is
    // the contract consumers (joins/aggregates) rely on
    assert(exploded.toSet == vals.toSet)
    assert(exploded.length == vals.distinct.length)
  }

  test("bitmap64_union equals or_agg over the same inputs") {
    val spark2 = spark
    import spark2.implicits._
    val a = (1L to 100L).toDF("v").agg(bitmap64Agg(col("v"))).collect()(0)
      .getAs[Array[Byte]](0)
    val b = (90L to 150L).toDF("v").agg(bitmap64Agg(col("v"))).collect()(0)
      .getAs[Array[Byte]](0)
    val viaUnion = Seq((a, b)).toDF("a", "b")
      .select(bitmap64Card(bitmap64Union(col("a"), col("b"))))
      .collect()(0).getLong(0)
    val viaOrAgg = Seq(a, b).toDF("bm")
      .agg(bitmap64Card(bitmap64OrAgg(col("bm"))))
      .collect()(0).getLong(0)
    assert(viaUnion == 150L && viaOrAgg == 150L)
  }

  test("q196/q346 reach identity: |B(u) OR union of neighbor bitmaps| - 1 " +
      "equals the wedge-expansion distinct count on a planted graph") {
    val spark2 = spark
    import spark2.implicits._
    // small random graph, undirected symmetric edge list
    val edges = (for {
      u <- 0L until 60L; v <- (u + 1) until 60L
      if ((u * 31 + v * 17) % 7) == 0
    } yield (u, v)).toDF("u", "v")
    val ee = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
    // reference: the old distinct-pair expansion
    val two = ee.as("a").join(ee.as("b"),
        col("a.v") === col("b.u") && col("a.u") =!= col("b.v"))
      .select(col("a.u").as("src"), col("b.v").as("dst"))
    val want = ee.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(two).distinct()
      .groupBy("src").agg(count(lit(1)).as("n"))
      .orderBy("src").collect().map(r => (r.getLong(0), r.getLong(1)))
    // bitmap shape, exactly as the queries compose it
    val s1 = ee.groupBy(col("u")).agg(bitmap64Agg(col("v")).as("bm"))
    val r2 = ee.join(s1.select(col("u").as("v"), col("bm")), "v")
      .groupBy(col("u")).agg(bitmap64OrAgg(col("bm")).as("bm2"))
    val got = s1.join(r2, "u")
      .select(col("u"),
        (bitmap64UnionCard(col("bm"), col("bm2")) - lit(1L)).as("n"))
      .orderBy("u").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sameElements(want))
  }
}
