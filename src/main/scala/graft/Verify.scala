package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // dev convenience: extra args restrict the dump to named queries
    // (the driver always passes exactly two, so the contract holds)
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", cpus,
      // micros (not INT96/nanos) so dumped timestamps carry the same
      // parquet logical type DuckDB emits — keeps the driver's
      // schema compare aligned.
      _.config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // Spark TimestampType is an instant (tz-aware); DuckDB's is
      // naive. Under the pinned UTC session the wall-clock values are
      // identical, so dump timestamps as NTZ micros to give the
      // driver's compare the same parquet logical type DuckDB emits.
      try {
        val out = fn(spark, sfDir)
        val ntz = out.schema.fields.filter(_.dataType == TimestampType)
          .foldLeft(out)((df, f) =>
            df.withColumn(f.name, col(f.name).cast(TimestampNTZType)))
        ntz.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        // a failed query must be a RED ROW in the round artifact, not
        // a missing key (VERDICT r7 #3: 39 queries vanished without a
        // trace): drop a marker file the driver can surface as an err
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try Files.writeString(Paths.get(s"$outDir/$name._ERROR"),
          s"$name: ${e.toString.take(2000)}\n")
        catch { case _: Throwable => () }
      }
      // the write above consumed the plan; drop any intermediates the
      // query persisted so 45 queries don't accumulate dead caches
      finally Caching.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
