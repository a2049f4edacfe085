package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must make graft_* functions available to a
  * session built only with `spark.sql.extensions` config — pure SQL,
  * no GraftFunctions.register call. Built as a sibling session on the
  * shared SparkContext; the suite's default session is restored
  * afterwards so other suites are unaffected. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions session runs graft_* from pure SQL") {
    val base = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // no .config and no register() here: the extensions class is
      // named in the shared SparkContext's static conf (set by
      // GraftSession when the context was created) and must apply to
      // this fresh session on its own
      val s = SparkSession.builder()
        .master("local[2]")
        .getOrCreate()
      assert(s ne base, "must be a fresh session, not the shared one")
      val dot = s.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
        .collect()(0).getDouble(0)
      assert(dot == 32.0)
      val jac = s.sql(
        "SELECT graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L))")
        .collect()(0).getDouble(0)
      assert(jac == 0.5)
      val sig = s.sql("SELECT size(graft_minhash(array(7L, 8L), 16))")
        .collect()(0).getInt(0)
      assert(sig == 16)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
