package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (nightly-ingest) dedup: clean a NEW batch of
  * documents against the fingerprint index of everything already
  * ingested, without reprocessing the corpus. The reference re-runs
  * its whole pipeline per load; at 100 TB the only viable shape is
  * batch-vs-index.
  *
  * Scale design — the index is corpus-sized (one row per unique
  * document ever seen), the batch is day-sized, so every join keeps
  * the INDEX on the streamed, never-shuffled side:
  *  1. collided = index ⋉ broadcast(batch fingerprints) — one
  *     broadcast semi-join; the index partitions stream past a
  *     day-sized hash table, nothing corpus-sized moves;
  *  2. survivors = batch ⟕̸ broadcast(collided) — collided is at
  *     most batch-distinct-sized, broadcast again;
  *  3. within-batch keep-first by fingerprint (one batch-sized
  *     window shuffle).
  * Emits both the surviving rows and their index entries, so the
  * caller can merge them into the index through
  * [[graft.sources.UpsertParquetSink]] and the next batch sees them.
  */
object Incremental {

  /** @param index relation with a `fingerprint` column (the persisted
    *              corpus index); only that column is read.
    * @return (survivors with `fingerprint`, new index entries
    *         `(fingerprint, keep_id)`) */
  def dedupAgainstIndex(batch: DataFrame, idCol: String, textCol: String,
      index: DataFrame): (DataFrame, DataFrame) = {
    val fp = batch.withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
    val collided = index.select(col("fingerprint"))
      .join(broadcast(fp.select(col("fingerprint")).distinct()),
        Seq("fingerprint"), "left_semi")
    val fresh = fp.join(broadcast(collided), Seq("fingerprint"), "left_anti")
    val survivors = Dedup.keepFirstByKey(fresh, Seq("fingerprint"), idCol)
    (survivors,
      survivors.select(col("fingerprint"), col(idCol).as("keep_id")))
  }
}
