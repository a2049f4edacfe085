package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Correctness gates for sketch/decorrelation queries that the
  * DuckDB oracle cannot hash-compare. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q43 HLL estimate within 5% of exact distinct per group") {
    // the catalog row now carries its own containment verdict
    // (ok = |HLL − exact| ≤ 5%·exact computed in-plan); assert it,
    // then re-derive the same margin independently of the query
    val rows = SparkEntry.queries("q43_approx_distinct")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)}: in-plan HLL containment failed"))
    val both = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect()
    both.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("q64 approx quantiles sit inside the ±ε rank window per group") {
    // the catalog row now asserts the GK rank-window containment
    // in-plan (ok column); assert it, then re-check the estimates
    // against exact order statistics computed independently
    val rows = SparkEntry.queries("q64_approx_quantiles")(spark, dir)
      .collect()
    assert(rows.length >= 3)
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)} p${r.getDouble(1)}: in-plan GK containment failed"))
    // GK guarantee at accuracy 10000: rank error ≤ n/10000 — assert
    // each estimate lies between the exact values at q ∓ ε (with a
    // one-rank slack for boundary arithmetic)
    val approx = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1)).toMap
    val eps = 1.0 / 10000
    for ((etype, estimates) <- approx) {
      val vals = Tables.events(spark, dir)
        .filter(col("event_type") === etype)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      val n = vals.length
      for ((q, est) <- Seq(0.5, 0.9, 0.99).zip(estimates)) {
        val lo = vals(math.max(0, (((q - eps) * n).floor.toInt - 1)
          .min(n - 1)))
        val hi = vals(math.min(n - 1, ((q + eps) * n).ceil.toInt))
        assert(est >= lo && est <= hi,
          s"$etype p$q: $est outside [$lo, $hi]")
      }
    }
  }

  test("q104 HLL rollup: merged daily sketches within 2% of the " +
      "direct sketch; both within 5% of exact") {
    // q104 carries both claims in-plan as booleans (driver-checked
    // containment, the q43/q64 pattern); the suite asserts every row
    // reports TRUE on both. Equality of merged and direct holds only
    // in sparse mode — at sf0.1 the union crosses into dense HLL and
    // the two estimates of the same set drift ≤ 1.26% (measured).
    val rows = SparkEntry.queries("q104_hll_rollup")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), // merge_ok
        s"${r.getString(0)}: merged estimate > 2% from direct estimate")
      assert(r.getBoolean(3), // bound_ok
        s"${r.getString(0)}: an estimate off exact by > 5% " +
          s"(exact=${r.getLong(1)})")
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

  test("bloom cap: session maxNumBits stays under the JVM " +
      "byte-array serialization ceiling (ADVICE r14 #3)") {
    val bits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    // a filter at the cap serializes to ~bits/8 bytes (+ header);
    // past Int.MaxValue the aggregate CRASHES on serialization
    // instead of degrading — keep >= 128 MB of slack for the stream
    // header and ByteArrayOutputStream doubling
    assert(bits / 8 + (128L << 20) < Int.MaxValue.toLong,
      s"maxNumBits=$bits serializes past the JVM array ceiling")
    // and the cap still clears the honest-fpp design point claimed
    // in q361's scale note (~1.6B items at 10 bits/item)
    assert(bits >= 16000000000L)
    // bloomAgg with the executing DataFrame's own session (ADVICE
    // r14 #4): filter builds and probes correctly
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).select(col("id").cast("string").as("s"))
    val bf = df.select(graft.functions.GraftFunctions
        .bloomAgg(col("s"), 1000L, df.sparkSession).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probe = spark.range(2000)
      .select(col("id").cast("string").as("s"))
      .withColumn("hit", graft.functions.GraftFunctions
        .bloomMightContain(lit(bf), col("s")))
    val hits = probe.filter(col("hit")).count()
    assert(hits >= 1000, "no false negatives")
    assert(hits < 1200, s"fpp blown: $hits/2000 probed positive")
  }
}
