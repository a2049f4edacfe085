package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

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
    * interrupted build is retried, never trusted.
    *
    * Safe across concurrent JVMs (two processes racing the same
    * layout — e.g. a Verify and a Bench): the check-build-stamp
    * critical section holds an OS-level FileChannel lock keyed on the
    * layout dir, so the loser of the race re-checks under the lock
    * and sees the winner's stamp instead of overwriting a layout the
    * winner may be mid-write on. The stamp itself goes through a
    * temp-file + ATOMIC_MOVE rename, so a reader can never observe a
    * half-written marker as a valid signature. */
  // per-dir monitor for SAME-JVM contention: OS file locks are held
  // per-JVM, and a second thread's ch.lock() on an overlapping region
  // throws OverlappingFileLockException instead of waiting — threads
  // serialize here first, processes on the file lock inside
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def once(dir: String, sig: String)(build: => Unit): Unit = {
    val m = Paths.get(dir, marker)
    def stamped = Files.exists(m) && Files.readString(m) == sig
    if (stamped) return // fast path: no lock traffic once built
    jvmLocks.computeIfAbsent(dir, _ => new Object).synchronized {
      // lock file lives BESIDE the layout dir (dir may be wiped by
      // the build itself); name keyed on the dir so unrelated layouts
      // never serialize on each other
      val lockPath = Paths.get(
        dir.stripSuffix("/") + ".lock")
      Files.createDirectories(lockPath.getParent)
      val ch = FileChannel.open(lockPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock() // blocks until the racing builder finishes
        try {
          if (!stamped) { // re-check: the lock winner may have built it
            build
            Files.createDirectories(m.getParent)
            val tmp = m.resolveSibling(marker + ".tmp")
            Files.writeString(tmp, sig)
            Files.move(tmp, m, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
          }
        } finally lock.release()
      } finally ch.close()
    }
  }
}
