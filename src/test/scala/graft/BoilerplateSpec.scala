package graft

import graft.text.Boilerplate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level boilerplate removal: planted shared footer comes out
  * of every document, unique content survives in order, counts and
  * reassembly are exact. */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val footer = "copyright acme corp all rights reserved visit www"

  test("shared footer chunk removed everywhere; unique content kept") {
    // 8-token chunks: doc text = 8 unique tokens + the 8-token footer
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta theta $footer"),
      (2L, s"one two three four five six seven eight $footer"),
      (3L, s"ape bat cat dog elk fox gnu hen $footer"),
      (4L, "lone wolf text with no footer at all here") // 9 tokens
    ).toDF("doc_id", "text")
    val got = Boilerplate.removeDuplicatedChunks(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect()
    assert(got.length == 4)
    got.foreach(r => assert(r.getLong(1) == 2L,
      s"n_chunks of doc ${r.getLong(0)}"))
    // footer chunk gone, first chunk intact
    assert(got(0).getLong(2) == 1 &&
      got(0).getString(3) == "alpha beta gamma delta epsilon zeta eta theta")
    assert(got(1).getString(3) == "one two three four five six seven eight")
    // doc 4's two chunks (8 + 1 tokens) both unique → untouched
    assert(got(3).getLong(2) == 2 &&
      got(3).getString(3) == "lone wolf text with no footer at all here")
  }

  test("minCount > 2 keeps EVERY occurrence of sub-threshold chunks") {
    // a chunk appearing twice is NOT boilerplate at minCount=3: both
    // occurrences must survive (the single-aggregate fast path's
    // "max is the unique occurrence" invariant only holds at the
    // default threshold — the general path anti-joins instead)
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 a5 a6 a7 a8 $shared"),
      (2L, s"b1 b2 b3 b4 b5 b6 b7 b8 $shared")
    ).toDF("doc_id", "text")
    val got = Boilerplate
      .removeDuplicatedChunks(docs, "doc_id", "text", minCount = 3)
      .orderBy("doc_id").collect()
    assert(got(0).getLong(2) == 2 &&
      got(0).getString(3) == s"a1 a2 a3 a4 a5 a6 a7 a8 $shared")
    assert(got(1).getLong(2) == 2 &&
      got(1).getString(3) == s"b1 b2 b3 b4 b5 b6 b7 b8 $shared")
  }

  test("within-doc repetition counts toward the corpus threshold; " +
      "fully-boilerplate doc rebuilds to empty") {
    val rep = "spam spam spam spam spam spam spam spam"
    val docs = Seq(
      (1L, s"$rep $rep"), // the same chunk twice in ONE doc
      (2L, "unique content stays put even when short")
    ).toDF("doc_id", "text")
    val got = Boilerplate.removeDuplicatedChunks(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 2 && got(0).getLong(2) == 0 &&
      got(0).getString(3) == "")
    assert(got(1).getLong(2) == 1)
  }

  test("chunk order preserved on reassembly; short tail chunk handled") {
    // 20 tokens -> chunks of 8, 8, 4; none duplicated
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Boilerplate.removeDuplicatedChunks(docs, "doc_id", "text")
      .collect()
    assert(got(0).getLong(1) == 3 && got(0).getLong(2) == 3)
    assert(got(0).getString(3) == text)
  }

  test("dup detection is one aggregate, not a self-join") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val plan = Boilerplate.removeDuplicatedChunks(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    // the rebuilt side joins back to per-doc totals (one join); the
    // chunk-duplicate stage itself must not add a second join
    assert(plan.split("Join").length - 1 == 1,
      s"expected exactly one join (totals), plan:\n$plan")
  }
}
