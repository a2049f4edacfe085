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
    runNoop("q01_demand_heatmap") // warmup (untimed)
    // min of two timed passes: one pass is dominated by first-run
    // effects (codegen compile, page cache, GC) that vary run to
    // run; the min is the steady-state cost of the declared plan
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val times = (1 to 2).map { _ =>
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
