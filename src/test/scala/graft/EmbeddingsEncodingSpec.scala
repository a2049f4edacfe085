package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture/lake-encoding drift wall for the VECTOR table — the same
  * regression class EventsEncodingSpec guards for events (VERDICT r7:
  * a regenerated physical type broke 39 queries), applied to the
  * next table a regeneration would touch. A real lake's embedding
  * shards are written by different engines over years: element type
  * (float32 vs float64) and id width (int32 vs int64) drift, and the
  * vector tier must produce identical ANSWERS for every encoding of
  * the same values. Gated on q32 (exact cosine top-k — deterministic,
  * oracle-checked) so any silent dtype-dependence in toDouble/norm/
  * dot/ranking surfaces as a row diff here, not a red driver row. */
class EmbeddingsEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rowsOf(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.select(col("q_id").cast("long"), col("n_id").cast("long"),
        col("cos"), col("rank").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted

  private lazy val expected =
    rowsOf(SparkEntry.queries("q32_cosine_topk")(spark, dir))

  /** Re-encode the fixture's embeddings under `transform` as a
    * single-file `<tmp>/embeddings.parquet` (the fixture layout). */
  private def writeEncoded(name: String)(
      transform: DataFrame => DataFrame): String = {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory(s"graft_emb_$name").toString
    transform(Tables.embeddings(spark, dir))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/_stage")
    val part = Files.list(Paths.get(s"$tmp/_stage")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    Files.move(Paths.get(part), Paths.get(s"$tmp/embeddings.parquet"))
    tmp
  }

  private val encodings: Seq[(String, DataFrame => DataFrame)] = Seq(
    // the current fixture shape, round-tripped (list<float32>, int64)
    "float32 elements" -> identity,
    // a float64-writing engine: every float32 is exactly
    // representable as float64, so answers must be bit-identical
    "float64 elements" -> (df => df.withColumn("embedding",
      col("embedding").cast(ArrayType(DoubleType)))),
    // a narrow-id writer (int32 keys are common in exported shards)
    "int32 vec_id" -> (df => df.withColumn("vec_id",
      col("vec_id").cast(IntegerType))))

  for ((name, transform) <- encodings) {
    test(s"q32 exact top-k answers are identical from $name") {
      val tmp = writeEncoded(name.replaceAll("\\W", ""))(transform)
      assert(rowsOf(SparkEntry.queries("q32_cosine_topk")(spark, tmp))
        == expected, s"$name: q32 rows differ")
      Caching.releaseAll()
    }
  }

  test("LSH near-dup pairs are identical from float64 elements") {
    // the approximate path's keys come from the same toDouble
    // boundary; float32→float64 exactness means the band keys, the
    // candidates, and the verified pairs must all match exactly
    val tmp = writeEncoded("lshf64")(df => df.withColumn("embedding",
      col("embedding").cast(ArrayType(DoubleType))))
    def pairs(d: String): Set[(Long, Long)] =
      SparkEntry.queries("q38_embedding_neardup_lsh")(spark, d)
        .select(col("a_id").cast("long"), col("b_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairs(dir)
    Caching.releaseAll()
    assert(pairs(tmp) == base, "float64 fixture changed the pair set")
    Caching.releaseAll()
  }
}
