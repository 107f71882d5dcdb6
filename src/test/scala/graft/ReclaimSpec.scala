package graft

import java.io.{File, RandomAccessFile}

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.Reclaim

/** Regression pin for the r14 sweep-killer (round 15, verdict #7): a
  * dead session's 31 GB blockmgr orphan in the SHARED /tmp made every
  * `settleIfLarge` run to its 5-poll stall (~10-15 s of GC spins, twice
  * per query → rc 124 driver timeout). With the ownership-scoped gauge,
  * foreign debris is invisible to settle (it can never drain by this
  * JVM's GC) and stale orphans are deleted directly at session start.
  */
class ReclaimSpec extends AnyFunSuite {

  private def sparseOrphan(sizeBytes: Long, ageMs: Long): File = {
    val dir = new File(System.getProperty("java.io.tmpdir"),
      s"blockmgr-${java.util.UUID.randomUUID()}")
    assert(dir.mkdir())
    val f = new File(dir, "shuffle_0_0_0.data")
    val raf = new RandomAccessFile(f, "rw")
    try raf.setLength(sizeBytes) finally raf.close() // sparse: no real disk
    val t = System.currentTimeMillis() - ageMs
    f.setLastModified(t); dir.setLastModified(t)
    dir
  }

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(): Unit
  }

  test("settle does not stall on a foreign >8GB orphan (the rc-124 mechanism)") {
    val orphan = sparseOrphan(9L << 30, ageMs = 0)
    try {
      // bench startup order: orphan already on disk, THEN the mark
      Reclaim.markForeign()
      assert(Reclaim.debrisBytes() === 0L,
        "foreign debris must be invisible to the session-scoped gauge")
      val t0 = System.nanoTime()
      // Bench.settleIfLarge's exact shape
      if (Reclaim.debrisBytes() > (8L << 30))
        Reclaim.settle(floorBytes = 2L << 30, maxWaitMs = 60000): Unit
      val wallSec = (System.nanoTime() - t0) / 1e9
      assert(wallSec < 1.0,
        f"settle path took $wallSec%.1f s against foreign debris — the stall is back")
    } finally rmTree(orphan)
  }

  // day-scale thresholds: a real suite run must never purge the LIVE
  // test session's own scratch (whose newest mtime can drift past
  // minutes between shuffles); the mechanism under test is identical
  test("purgeOrphans deletes stale dead-session dirs, spares fresh ones") {
    val stale = sparseOrphan(9L << 30, ageMs = 3L * 24 * 60 * 60 * 1000) // 3 d old
    val fresh = sparseOrphan(1L << 20, ageMs = 0)                        // live session
    try {
      val freed = Reclaim.purgeOrphans(staleMs = 2L * 24 * 60 * 60 * 1000)
      assert(!stale.exists(), "stale orphan must be deleted directly, not GC-waited")
      assert(freed >= (9L << 30), s"freed $freed bytes; expected the 9 GB orphan")
      assert(fresh.exists(), "a fresh (possibly live) dir must survive the purge")
    } finally { rmTree(stale); rmTree(fresh) }
  }

  test("purgeOrphans never touches non-UUID names like spark-local") {
    val cfg = new File(System.getProperty("java.io.tmpdir"), "spark-local-reclaimspec")
    assert(cfg.mkdir() || cfg.isDirectory)
    cfg.setLastModified(System.currentTimeMillis() - 3L * 24 * 60 * 60 * 1000)
    try {
      Reclaim.purgeOrphans(staleMs = 2L * 24 * 60 * 60 * 1000): Unit
      assert(cfg.exists(), "a configured local dir must never match the scratch pattern")
    } finally rmTree(cfg)
  }
}
