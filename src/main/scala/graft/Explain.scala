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
    // `Explain qNN_...` (no dir) is a natural invocation — accept it:
    // any leading arg that names a catalog query is a name, not a dir
    val (sfDir, rest) = args.headOption match {
      case Some(a) if SparkEntry.queries.contains(a) =>
        ("/root/testdata/sf0.001", args.toSeq)
      case Some(a) => (a, args.drop(1).toSeq)
      case None => ("/root/testdata/sf0.001", Seq.empty[String])
    }
    val names = if (rest.nonEmpty) rest
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
