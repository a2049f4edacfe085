package graft

/** Dev tool: print the EXECUTED plan (post-AQE) of one or more
  * catalog queries. Usage:
  *   graft.Explain <sfDir> <queryName> [queryName ...]
  * Collects each query first so AQE finalizes, then dumps the plan —
  * the same string PlanAuditSpec gates against.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query> [query...]")
    val spark = GraftSession.create(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, args(0))
      df.collect()
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
