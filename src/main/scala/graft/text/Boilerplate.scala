package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal — the C4/CCNet cleaning step
  * that deletes every text span occurring more than once ACROSS the
  * corpus (headers, footers, navigation chrome, license blurbs) and
  * reassembles each document from its surviving spans in order.
  * Operates on fixed-size token chunks (the harness corpus has no
  * newline structure; with real documents the splitter would be
  * lines/sentences — same plan shape).
  *
  * Scale design — two shuffles, no self-join, no per-group lists:
  *  1. chunking is row-local (`transform(sequence…)` + `slice`, all
  *     codegen array ops);
  *  2. duplicate detection is ONE `groupBy(chunk)` with
  *     `count + max(struct(doc, idx))` — when the count is 1 the max
  *     IS the unique occurrence, so survivors come out of the same
  *     aggregate that found the duplicates (the naive
  *     dups-then-anti-join recomputes the chunk relation twice and
  *     shuffles it twice, pitfall: self-joins recompute upstream);
  *     partial aggregation combines map-side, and constant-width
  *     state (a count and one struct) holds for arbitrarily hot
  *     chunks — no collect_list blowup on a million-fold footer.
  *     At 100 TB the group key would be a 128-bit chunk hash rather
  *     than the chunk text to halve shuffle width;
  *  3. reassembly is one `groupBy(doc_id)` sorting the surviving
  *     (idx, chunk) structs row-locally.
  */
object Boilerplate {

  /** Split a token array into `n`-token chunk strings (last chunk may
    * be short). Row-local codegen array ops. */
  def chunkStrings(toks: Column, n: Int): Column =
    transform(
      sequence(lit(0), floor((size(toks) - lit(1)) / n).cast("int")),
      i => array_join(slice(toks, i * n + lit(1), lit(n)), " "))

  /** Per-document result of corpus-dedup at chunk granularity:
    * (doc_id, n_chunks, kept_chunks, rebuilt) where `rebuilt` is the
    * document with every corpus-duplicated chunk removed. Chunks
    * appearing `minCount`+ times corpus-wide (within-doc repeats
    * included) are boilerplate. */
  def removeDuplicatedChunks(docs: DataFrame, idCol: String,
      textCol: String, chunkTokens: Int = 8, minCount: Int = 2)
      : DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    val chunks = toks.select(col("doc_id"),
        posexplode(chunkStrings(col("toks"), chunkTokens))
          .as(Seq("chunk_idx", "chunk")))
    // minCount == 2 (the C4 default): one shuffle — duplicate counts
    // and the sole survivor per unique chunk out of the same
    // constant-state aggregate ("the max IS the unique occurrence"
    // holds because every surviving chunk has cnt == 1).
    // minCount > 2: that invariant BREAKS — a chunk with
    // 1 < cnt < minCount is not boilerplate and ALL its occurrences
    // must survive, so the general path anti-joins the occurrence
    // stream against the boilerplate chunk set (second shuffle, the
    // honest cost of the looser threshold).
    val kept = if (minCount <= 2) {
      chunks.groupBy(col("chunk"))
        .agg(count(lit(1)).as("cnt"),
          max(struct(col("doc_id"), col("chunk_idx"))).as("occ"))
        .filter(col("cnt") < minCount)
        .select(col("occ.doc_id").as("doc_id"),
          col("occ.chunk_idx").as("chunk_idx"), col("chunk"))
    } else {
      val boiler = chunks.groupBy(col("chunk"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
        .select(col("chunk"))
      chunks.join(boiler, Seq("chunk"), "left_anti")
        .select(col("doc_id"), col("chunk_idx"), col("chunk"))
    }
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_chunks"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          s => s.getField("chunk")), " ").as("rebuilt"))
    toks.select(col("doc_id"),
        (floor((size(col("toks")) - lit(1)) / chunkTokens) + lit(1))
          .cast("long").as("n_chunks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        coalesce(col("rebuilt"), lit("")).as("rebuilt"))
  }
}
