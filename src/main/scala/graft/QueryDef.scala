package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: the Spark plan builder plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle
  * SQL the driver hash-compares against.
  *
  * Determinism discipline (SURVEY.md §5/§7.3): every query ends in a
  * total ORDER BY (tie-broken to a unique key prefix) in BOTH the
  * Spark plan and the oracle SQL, every floating aggregate is rounded
  * to 6 decimals on both sides, and every computed column carries the
  * same alias on both sides (the driver sorts columns by name before
  * hashing).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
