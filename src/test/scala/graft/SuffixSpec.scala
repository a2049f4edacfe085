package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q358's prefix-doubling duplicated-run tiers vs a brute-force
  * window-string count on a planted corpus. The doubling labels are
  * equality-consistent by induction; this spec pins the INDUCTION
  * BASE AND STEP against literal window strings at every tier the
  * corpus supports, on a corpus where the expected dup structure is
  * known by construction (a license-boilerplate block shared by two
  * docs, a third unrelated doc, a doc shorter than the deepest
  * window). */
class SuffixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_suffix").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("prefix-doubling tiers equal brute-force window-string counts") {
    val boiler = (1 to 40).map(i => s"lic$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"x1 x2 x3 $boiler y1 y2"),
      (3L, (1 to 50).map(i => s"uniq$i").mkString(" ")),
      (4L, "short doc only")))
    val got = SparkEntry.queries("q358_dup_run_tiers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // brute force: explode every window of length w as its literal
    // token string, count global occurrences
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
    val expected = Seq(1, 2, 4, 8, 16, 32).map { w =>
      val wins = toks
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("toks")) - (w - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(w))))).as("g"))
        .filter(size(col("toks")) >= w)
      val c = wins.join(
          wins.groupBy(col("g")).agg(count(lit(1)).as("c")), "g")
      val r = c.agg(count(lit(1)),
        coalesce(sum(when(col("c") > 1, 1L)), lit(0L)),
        count_distinct(when(col("c") > 1, col("doc_id"))))
        .collect()(0)
      (w.toLong, r.getLong(0), r.getLong(1), r.getLong(2))
    }.filter(_._2 > 0)
    assert(got.toSeq == expected,
      s"got ${got.toSeq}\nexpected $expected")
    // the planted boilerplate must surface at the 32-token tier in
    // exactly the two docs that share it
    val t32 = got.find(_._1 == 32L).get
    assert(t32._4 == 2, s"32-tier docs: $t32")
  }
}
