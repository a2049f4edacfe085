package graft

/** Plan-inspection entry point: prints `.explain("formatted")` for the
  * named queries (all if none given). Usage:
  *   runMain graft.Explain <sfDir> [queryName ...]
  * Dev/judge tool — the per-operator scale claims (broadcast choice,
  * TakeOrderedAndProject, pushed filters, codegen spans) are checked
  * against this output.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
