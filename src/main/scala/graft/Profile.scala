package graft

import graft.vector.VectorOps
import org.apache.spark.sql.functions._

/** Dev diagnostic: stage-level timings for the operators Bench flags
  * as slow — runs each fragment twice cache-cold and prints the min,
  * so a regression can be localized to a stage instead of re-guessed
  * from the query total. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        Caching.releaseAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-40s ${ts.min}%8.3f s")
    }

    val emb = Tables.embeddings(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // q38 fragments
    timed("q38 candidates only")(
      noop(VectorOps.cpCandidatePairs(emb)))
    timed("q38 full")(noop(VectorOps.nearDupPairsLsh(emb, 0.45)))
    timed("q38 cp keys (base, 1 eval)")(
      noop(emb.repartition(32).select(col("vec_id"),
        explode(graft.functions.GraftFunctions.cpKeys(
          VectorOps.toDouble(col("embedding")), 2, 128, 1)).as("key"))))
    timed("q38 cp keys (probe, 1 eval)")(
      noop(emb.repartition(32).select(col("vec_id"),
        explode(graft.functions.GraftFunctions.cpKeys(
          VectorOps.toDouble(col("embedding")), 2, 128, 2)).as("key"))))

    // q40 fragments
    val queries = emb.filter(col("vec_id") < 10)
    timed("q40 full")(noop(VectorOps.ivfTopK(emb, queries, 3)))
    timed("q33 full")(noop(VectorOps.lshTopK(emb, queries, 3)))
    timed("q32 brute full")(noop(VectorOps.bruteForceTopK(emb, queries, 5)))
    spark.stop()
  }
}
