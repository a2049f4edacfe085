package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters (Misra & Gries '82; the "frequent"
  * algorithm): find every token with frequency > n/(k+1) WITHOUT
  * shuffling the full vocabulary.
  *
  * Two passes, the standard distributed shape:
  *  1. map-side: each partition folds its tokens through a k-counter
  *     Misra-Gries summary (bounded state, one pass) and emits at
  *     most k candidate tokens. The MG guarantee is per-partition:
  *     any token with local frequency > n_p/(k+1) survives; a token
  *     with GLOBAL frequency > n/(k+1) must exceed the local
  *     threshold in at least one partition (else summing the per-
  *     partition bounds contradicts the global count), so the union
  *     of partition candidates is a superset of the true heavy
  *     hitters.
  *  2. exact recount of candidates only: broadcast the candidate set
  *     (≤ k × partitions rows), count matching tokens exactly, keep
  *     count·(k+1) > n — integer arithmetic, so the output is
  *     EXACTLY the true heavy-hitter set and hash-comparable against
  *     an exact-count oracle.
  *
  * At 100 TB this is the frequent-token query when the vocabulary
  * itself is too big to shuffle (q50's wordcount shuffles vocabulary;
  * this shuffles k × partitions candidates + the final tiny recount).
  */
object HeavyHitters {

  /** Per-partition Misra-Gries summaries: at most k (token, weight)
    * rows per partition. Weights are MG lower-bound counters, only
    * used as candidates — the exact recount happens in pass 2. */
  private def partitionCandidates(toks: DataFrame, k: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.select(col("tok")).as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        if (counters.contains(t)) counters(t) += 1
        else if (counters.size < k) counters(t) = 1
        else {
          // decrement-all: drop zeros (amortized O(1) per token via
          // the shared decrement offset would be fancier; explicit
          // decrement keeps the summary exact and k is small)
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counters.keysIterator.foreach { key =>
            val next = counters(key) - 1
            if (next == 0) dead += key else counters(key) = next
          }
          dead.foreach(counters.remove)
        }
      }
      counters.iterator.map { case (t, w) => (t, w) }
    }.toDF("tok", "w")
  }

  /** Exact heavy hitters over a one-column (`tok`) relation: tokens
    * with count·(k+1) > n. Output (tok, cnt), exact.
    *
    * The input feeds THREE jobs (MG candidate pass, the n count, the
    * recount join), so it is persisted for the duration — unpersisted,
    * the upstream tokenize/explode chain re-executes per consumer
    * (the same 3× redundancy minhashNearDupPairs measured and
    * persists against). */
  def heavyHitters(toks: DataFrame, k: Int): DataFrame = {
    val t = graft.Caching.retain(toks.persist())
    val candidates = partitionCandidates(t, k)
      .select(col("tok")).distinct()
    val n = t.count()
    t.join(broadcast(candidates), "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n)
  }
}
