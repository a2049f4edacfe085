package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate for a bounded top-k heap. Ordering:
  * higher `ord` wins; exact `ord` ties break to the SMALLER `id`, so
  * the result is total and engine-portable (same convention as
  * `row_number() OVER (ORDER BY ord DESC, id)`). */
final case class ScoredId(ord: Double, id: Long)

/** Exact per-group top-k as a bounded-heap AGGREGATE, not a window.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER
  * BY ord DESC)` then `rk <= k`) sorts EVERY group's every row — at
  * 100 TB that is a full shuffle + sort of the corpus to keep k rows
  * per group. This Aggregator keeps a k-bounded buffer instead, so:
  *   - map side: each task reduces its rows into at most k entries
  *     per (group × partition) — partial aggregation works, and only
  *     k rows per group per task cross the shuffle;
  *   - reduce side: merges are k+k list merges, no sort of the data.
  * Spark plans it as ObjectHashAggregate(partial) → Exchange →
  * ObjectHashAggregate(final); `TopKSpec` gates both the exact
  * equality with the window formulation and the no-Window/no-global-
  * sort plan shape.
  *
  * Buffer is a descending-sorted array of ≤ k `ScoredId`; insert is
  * O(k) (append + bounded insertion walk), merge is a linear k+k
  * merge. k is assumed small (top-3/top-100, not top-1M).
  */
final class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Array[ScoredId], Array[ScoredId]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.ord > b.ord || (a.ord == b.ord && a.id < b.id)

  override def zero: Array[ScoredId] = Array.empty

  override def reduce(buf: Array[ScoredId], x: ScoredId): Array[ScoredId] = {
    if (buf.length == k && !beats(x, buf(k - 1))) buf
    else {
      // insertion position in the (already sorted) buffer
      var i = 0
      while (i < buf.length && beats(buf(i), x)) i += 1
      val n = math.min(buf.length + 1, k)
      val out = new Array[ScoredId](n)
      System.arraycopy(buf, 0, out, 0, i)
      out(i) = x
      if (i + 1 < n) System.arraycopy(buf, i, out, i + 1, n - i - 1)
      out
    }
  }

  override def merge(a: Array[ScoredId], b: Array[ScoredId]): Array[ScoredId] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val n = math.min(a.length + b.length, k)
      val out = new Array[ScoredId](n)
      var i = 0; var j = 0; var o = 0
      while (o < n) {
        out(o) =
          if (j >= b.length || (i < a.length && beats(a(i), b(j)))) {
            i += 1; a(i - 1)
          } else { j += 1; b(j - 1) }
        o += 1
      }
      out
    }
  }

  override def finish(r: Array[ScoredId]): Array[ScoredId] = r

  override def bufferEncoder: Encoder[Array[ScoredId]] =
    ExpressionEncoder[Array[ScoredId]]()
  override def outputEncoder: Encoder[Array[ScoredId]] =
    ExpressionEncoder[Array[ScoredId]]()
}

object TopK {
  /** `topk(k)(ordCol, idCol)` → `array<struct<ord,id>>` of the k
    * best rows per group, descending, ties to the smaller id. */
  def topk(k: Int): UserDefinedFunction =
    udaf(new TopKAgg(k), ExpressionEncoder[ScoredId]())
}
