package graft

/** Per-round benchmark: times every catalog query at the given scale
  * factor and prints one JSON line for the driver.
  *
  * Each query executes its DECLARED plan into the built-in `noop`
  * sink — unlike `count()`, which lets Catalyst drop the final sort
  * and prune projected columns, so the measurement covers what the
  * query actually promises. Failures propagate: a broken query must
  * fail the bench loudly, not record a fast "success". A warmup run
  * of the flagship shape absorbs JVM/session/codegen startup so the
  * first timed query isn't charged for it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    def runNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // warmup (untimed): one query per native-expression family, so
    // the first TIMED query of each family measures the steady-state
    // plan rather than absorbing that family's C2/codegen compilation
    // (measured: q33 reads 1.8 s when it is the first cross-polytope
    // plan of the JVM, 0.7 s steady-state). Caches are still cleared
    // before every timed pass — warmup only warms code, not data.
    Seq("q01_demand_heatmap", // relational/codegen baseline
      "q30_dedup_minhash",    // shingle + minhash + jaccard exprs
      "q31_dedup_simhash",    // simhash expr
      "q33_ann_lsh",          // cross-polytope + dot exprs
      "q79_dup_spans"         // positional gram-hash expr
    ).foreach(runNoop)
    // min of two timed passes: one pass is dominated by first-run
    // effects (codegen compile, page cache, GC) that vary run to
    // run; the min is the steady-state cost of the declared plan.
    // Every pass starts cache-cold: operator persists are released
    // and the catalog cleared BEFORE the timer, else CacheManager's
    // canonicalized-plan matching lets pass 2 read pass 1's caches
    // and the min becomes a warm-cache number (VERDICT r2 #2).
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val times = (1 to 2).map { _ =>
        Caching.releaseAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        runNoop(name)
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
