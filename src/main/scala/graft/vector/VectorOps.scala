package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ArrayType(FloatType)).
  *
  * Two tiers, per the engine brief:
  *  - brute-force cosine top-k: broadcast the (small) query set,
  *    score map-side against the corpus — zero shuffle of the corpus
  *    except the final per-query top-k window on `numQueries`
  *    partitions. The exact baseline.
  *  - LSH-bucketed ANN (random hyperplanes): signatures are
  *    row-local; candidate generation is a bucket equi-join, so the
  *    corpus is never all-paired. The 100 TB path.
  *
  * All vector math is double-precision row-local folds (zip_with +
  * aggregate) — deterministic element order, reproducible across
  * engines for the oracle.
  */
object VectorOps {

  /** Cast a float array to double (all math in double — float
    * accumulation drifts and is not oracle-stable). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    * Queries are broadcast (small side); scores are computed in the
    * corpus scan stage; ranking is on round(cos, 6) with an id
    * tie-break so results are stable across engines and runs. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"),
      toDouble(col(vecCol)).as("n_v"))
    val q = queries.select(col(idCol).as("q_id"),
      toDouble(col(vecCol)).as("q_v"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", round(cosine(col("q_v"), col("n_v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** Deterministic ±1.0 pseudo-random hyperplane component for
    * (plane, dim) — derived from xxhash64 so every executor (and
    * every round) builds identical planes with no driver state. */
  private def planeComponent(plane: Int, dim: Column): Column =
    when(xxhash64(concat(lit(s"$plane:"), dim.cast("string")))
      .bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))

  /** Random-hyperplane LSH signature: `bits` sign bits packed into a
    * long. Row-local (no shuffle, no fitted model); expanded as
    * static bit terms (Column-API shifts need Scala Int amounts). */
  def lshSignature(vec: Column, bits: Int): Column =
    (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (a, x) => a + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via LSH banding: signatures split into `bands` chunks;
    * vectors sharing any chunk are candidates, then exact-cosine
    * scored and top-k'd per query. Approximate by design (recall
    * depends on banding); the exact baseline is bruteForceTopK. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, prefix: String) = df
      .select(col(idCol).as(s"${prefix}_id"),
        toDouble(col(vecCol)).as(s"${prefix}_v"),
        lshSignature(toDouble(col(vecCol)), bits).as("__sig"))
      .select(col(s"${prefix}_id"), col(s"${prefix}_v"),
        explode(array((0 until bands).map(b => struct(
          lit(b).as("band"),
          shiftright(col("__sig"), b * bandBits)
            .bitwiseAND(lit(mask)).as("bucket"))): _*)).as("__b"))
      .select(col(s"${prefix}_id"), col(s"${prefix}_v"),
        col("__b.band"), col("__b.bucket"))
    val cb = banded(corpus, "n")
    val qb = banded(queries, "q")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    cb.join(broadcast(qb),
        cb("band") === qb("band") && cb("bucket") === qb("bucket")
          && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), col("q_v"), col("n_v")).distinct()
      .withColumn("cos", round(cosine(col("q_v"), col("n_v")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cos"), col("rank"))
  }

  /** Exact embedding near-dup pairs: all pairs with cosine >= tau.
    * Brute-force block self-join — the exactness baseline the LSH
    * path approximates; at cluster scale prefer lshTopK-style
    * bucketing before this verify. */
  def nearDupPairs(df: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("a_id"), toDouble(col(vecCol)).as("a_v"))
    val b = df.select(col(idCol).as("b_id"), toDouble(col(vecCol)).as("b_v"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", round(cosine(col("a_v"), col("b_v")), 6))
      .filter(col("cos") >= tau)
      .select(col("a_id"), col("b_id"), col("cos"))
  }
}
