package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the latest right row
  * with `rightTs` <= `leftTs` on the same key (the market-data /
  * feature-lookup join Spark lacks natively; SURVEY.md §2.7,
  * engine-brief custom-operator list).
  *
  * Implementation is the union-merge (composition rung (a) of the
  * custom-operator ladder — no custom plan node needed): tag both
  * sides, union, and per key carry the last non-null right payload
  * forward over event order (rights sort before lefts at equal
  * timestamps, making the match inclusive). ONE shuffle on the key,
  * zero join blowup — a right row with a thousand later lefts is
  * visited once, unlike the join+filter+rank form whose intermediate
  * is O(left × matching rights). At 100 TB this is the same
  * merge-scan shape kdb/Flink use for as-of semantics.
  *
  * Contract: right rows must be unique per (key, rightTs) — dedupe
  * first (e.g. max_by) or the carried payload among ties is
  * order-dependent.
  *
  * The payload travels as ONE struct per right row (NULL on left
  * rows), and `last(ignoreNulls)` carries the whole struct: every
  * left row receives ALL payload fields from the SAME latest right
  * row — including that row's own NULL fields. Carrying each payload
  * column independently would skip a NULL in the latest row back to
  * an older row's value and could stitch together a combination
  * existing in no right row (ASOF-join semantic drift).
  */
object AsOf {

  /** @param payload right-side columns to carry onto each left row
    *                (null when no right row is at or before it). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    // align schemas: left rows carry a null payload struct; right
    // rows carry null left columns
    val l = left.withColumn("__t", col(leftTs)).withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
    val r = leftCols.filterNot(_ == keyCol).foldLeft(
      right.select((keyCol +: rightTs +: payload).distinct.map(col): _*)
        .withColumn("__t", col(rightTs)).withColumn("__tag", lit(0))
        .withColumn("__p", struct(payload.map(col): _*))
        .drop(rightTs +: payload: _*)) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    payload.foldLeft(merged.filter(col("__tag") === 1)) { (df, p) =>
        df.withColumn(p, col("__p").getField(p))
      }
      .drop("__t", "__tag", "__p")
  }
}
