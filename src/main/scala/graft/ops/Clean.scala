package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-hygiene operators.
  *
  * Re-expresses the reference's cleaning stage
  * (/root/reference/cleaning.py:10-18: dropna over 19 named columns).
  * `na.drop(cols)` plans as a conjunction of IsNotNull predicates that
  * Catalyst pushes to the parquet scan — at 100 TB this prunes row
  * groups via footer null-count stats before any row is materialized.
  */
object Clean {

  /** Drop rows with NULL in any of `cols` (all columns if empty). */
  def dropNulls(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.na.drop() else df.na.drop(cols)
}
