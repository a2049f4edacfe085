package graft

import graft.ops.AsOf
import org.scalatest.funsuite.AnyFunSuite

/** Golden semantics for the union-merge as-of join. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of: latest right at-or-before each left, per key") {
    val lefts = Seq(
      (1L, 100L, "l1"), (1L, 205L, "l2"), (1L, 300L, "l3"),
      (2L, 150L, "l4"), // key with no right at all before 200
      (3L, 50L, "l5") // key with no rights
    ).toDF("k", "lts", "lname")
    val rights = Seq(
      (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 400L, 40.0),
      (2L, 200L, 99.0)
    ).toDF("k", "rts", "rv")
    val got = AsOf.asofJoin(lefts, rights, "k", "lts", "rts", Seq("rv"))
      .orderBy($"k", $"lts")
      .collect().map(r => (r.getAs[String]("lname"),
        Option(r.getAs[java.lang.Double]("rv")).map(_.toDouble)))
    assert(got.toSeq == Seq(
      ("l1", Some(10.0)), // inclusive: rts == lts matches
      ("l2", Some(20.0)), // latest before 205 is 200
      ("l3", Some(20.0)), // 400 is in the future
      ("l4", None), // right exists only later
      ("l5", None))) // no rights for the key
  }

  test("NULL payload in the latest right row is carried as NULL, and " +
      "multi-column payloads never mix rows") {
    // ASOF semantics: the match is the latest right ROW — its own
    // NULL fields included. Carrying columns independently would
    // skip the NULL back to an older row's value (and stitch field
    // combinations existing in no right row).
    val lefts = Seq((1L, 300L, "l1")).toDF("k", "lts", "lname")
    val rights = Seq(
      (1L, 100L, Some(10.0), Some(2.0)),
      (1L, 200L, None: Option[Double], Some(9.0))
    ).toDF("k", "rts", "x", "y")
    val got = AsOf.asofJoin(lefts, rights, "k", "lts", "rts",
        Seq("x", "y")).collect()(0)
    assert(Option(got.getAs[java.lang.Double]("x")).isEmpty,
      "latest row's NULL x must stay NULL, not revert to 10.0")
    assert(got.getAs[java.lang.Double]("y") == 9.0)
  }
}
