package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication operators for training-data pipelines:
  * exact (hash groupBy), MinHash+LSH, SimHash — each designed so the
  * expensive part is row-local (signatures computed map-side) and the
  * only shuffles are (a) the group-by on hash buckets, whose
  * cardinality is bounded by the banding scheme, and (b) the final
  * candidate-pair join. That structure is what keeps the operator
  * viable at 100 TB: no all-pairs comparison ever materializes;
  * candidates come out of O(rows × bands) bucket entries.
  *
  * No reference counterpart (SURVEY.md §2.7) — extension tier per
  * BASELINE.json north star.
  */
object Dedup {

  /** Exact dedup: group rows by a content fingerprint; emit one
    * surviving id (min) + duplicate count per group. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Row-local MinHash signature: `numHashes` permutations simulated
    * by xxhash64(shingle || '|' || k); signature element k is the min
    * over the document's shingle set. Computed entirely map-side. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      k => array_min(transform(shingleCol,
        s => xxhash64(concat(s, lit("|"), k.cast("string"))))))

  /** LSH banding: split a signature into `bands` equal slices and
    * hash each; rows sharing any (band index, band hash) cell are
    * candidate pairs. */
  def lshBands(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        hash(slice(sigCol, b * lit(rowsPerBand) + lit(1),
          lit(rowsPerBand))).as("bucket")))

  /** Candidate near-dup pairs via MinHash+LSH over word n-gram
    * shingles, then EXACT Jaccard verification at `threshold`.
    * The verify step makes the output independent of the hash family
    * (LSH only affects recall, tuned here to ~1 at the threshold):
    * 128 hashes in 32 bands of 4 → P(candidate) at j=0.7 is
    * 1-(1-0.7^4)^32 ≈ 0.9998. */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 128, bands: Int = 32,
      ngram: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    val docs = df
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .filter(size(col("__toks")) >= ngram)
      .withColumn("__sh", TextOps.shingles(col("__toks"), ngram))
      .select(col(idCol).as("__id"), col("__sh"))
    val banded = docs
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .select(col("__id"),
        explode(lshBands(col("__sig"), bands, rowsPerBand)).as("__b"))
      .select(col("__id"), col("__b.band"), col("__b.bucket"))
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band")
          && col("x.bucket") === col("y.bucket")
          && col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a_id"), col("y.__id").as("b_id"))
      .distinct()
    candidates
      .join(docs.select(col("__id").as("a_id"), col("__sh").as("a_sh")), "a_id")
      .join(docs.select(col("__id").as("b_id"), col("__sh").as("b_sh")), "b_id")
      .withColumn("jaccard",
        TextOps.jaccardSets(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Row-local 64-bit SimHash over token hashes: bit b is set when
    * at least half the token hashes have bit b set. Expanded as 64
    * static bit terms (shift amounts must be Scala Ints in the Column
    * API); expects a pre-materialized array<long> column of token
    * hashes so the terms share one evaluation. */
  def simhash64(tokenHashes: Column): Column =
    (0 until 64).map { b =>
      when(size(filter(tokenHashes,
        h => shiftright(h, b).bitwiseAND(lit(1L)) === lit(1L))) * 2
        >= size(tokenHashes), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)


  /** Near-dup pairs by SimHash: candidates share one of 4 16-bit
    * chunks (any pair within hamming 8 shares a chunk at hamming<=3
    * by pigeonhole when distance concentrates; standard banding),
    * verified by exact popcount of the XOR at `maxHamming`. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame = {
    val sigs = df
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .filter(size(col("__toks")) > 0)
      .withColumn("__th", transform(col("__toks"), t => xxhash64(t)))
      .select(col(idCol).as("__id"), simhash64(col("__th")).as("__sim"))
    val chunked = sigs.select(col("__id"), col("__sim"),
        explode(array((0 until 4).map(c => struct(
          lit(c).as("chunk"),
          shiftright(col("__sim"), c * 16)
            .bitwiseAND(lit(0xFFFFL)).as("value"))): _*)).as("__c"))
      .select(col("__id"), col("__sim"), col("__c.chunk"), col("__c.value"))
    chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk")
          && col("x.value") === col("y.value")
          && col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a_id"), col("y.__id").as("b_id"),
        bit_count(col("x.__sim").bitwiseXOR(col("y.__sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Keep-first dedup by arbitrary key: survivor = lowest id per key
    * (row_number window — one shuffle on the key). */
  def keepFirstByKey(df: DataFrame, keyCols: Seq[String],
      orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
