package graft

import graft.ops.Graph
import org.scalatest.funsuite.AnyFunSuite

/** PageRank invariants on hand-computable graphs: symmetric cycles
  * stay uniform, weights split contributions proportionally, total
  * rank is conserved when no node dangles, and the Spark result
  * matches a driver-side reference power iteration exactly. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ranks(edges: Seq[(String, String, Long)], iters: Int)
      : Map[String, Double] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  /** Reference implementation: same arithmetic, driver-side. */
  private def refRanks(edges: Seq[(String, String, Long)], iters: Int)
      : Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        r(s) * w.toDouble / outw(s).toDouble
      }.sum).toMap
      r = nodes.map(v =>
        v -> ((1 - 0.85) / n + 0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("symmetric cycle stays uniform") {
    val cycle = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
    val got = ranks(cycle, 5)
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    // no dangling nodes → total rank conserved
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("weights split contributions proportionally") {
    // a sends 3:1 to b vs c; b and c return to a (no dangling)
    val g = Seq(("a", "b", 3L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L))
    val got = ranks(g, 1)
    // after one iteration from uniform: rb - rc = 0.85 * (0.75-0.25)/3
    assert(math.abs((got("b") - got("c")) - 0.85 * 0.5 / 3) < 1e-12)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("matches the reference power iteration bit-for-bit, " +
      "including dangling nodes") {
    val g = Seq(("a", "b", 2L), ("c", "b", 1L), ("b", "a", 1L),
      ("a", "d", 1L)) // d has no out-edges → dangles
    for (iters <- Seq(1, 3, 5)) {
      val got = ranks(g, iters)
      val exp = refRanks(g, iters)
      assert(got.keySet == exp.keySet)
      exp.foreach { case (k, v) =>
        assert(math.abs(got(k) - v) < 1e-14, s"node $k at iters=$iters")
      }
      // d leaks rank each round → total strictly below 1
      assert(got.values.sum < 1.0)
    }
  }
}
