package graft.tools

/** Between-run disk reclamation for the bench/campaign/profile paths
  * (round 14, verdict #2). A 21 GB sf100 corpus generates shuffle +
  * spill traffic that two back-to-back heavy runs stack past the
  * sandbox's ~50 GB free root disk — the r13 campaign's dd2/dd6
  * warm-ups and this round's first v7 profile attempt all died on
  * `No space left on device` under the PREVIOUS run's debris, which
  * Spark's ContextCleaner deletes only asynchronously after a GC
  * enqueues the dead shuffle references. [[settle]] makes that
  * reclamation synchronous-enough: GC, then poll the local-dir debris
  * until it drops under the floor or stops draining. At deployment the
  * same traffic spreads over every executor's local disks; this is
  * harness hygiene for the single-disk sandbox, not engine semantics.
  */
object Reclaim {

  /** Bytes currently held by Spark scratch (blockmgr-* / spark-*)
    * under java.io.tmpdir.
    */
  def debrisBytes(): Long = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("blockmgr-") ||
        f.getName.startsWith("spark-"))
      .map(du).sum
  }

  /** GC, then wait (bounded) for the ContextCleaner to drain shuffle
    * debris below `floorBytes`. Returns the debris remaining. GC is
    * re-issued each poll: reference processing is multi-cycle (a
    * shuffle's cleanup reference may only become reachable-for-enqueue
    * after an earlier cycle collected the RDD holding it), and the
    * first v7 sf100 settle measured 39 GB UNDRAINED after a
    * single-GC wait — the cleaner had nothing enqueued to clean.
    */
  def settle(floorBytes: Long = 8L << 30, maxWaitMs: Int = 60000): Long = {
    var waited = 0
    var cur = debrisBytes()
    var stalled = 0
    while (cur > floorBytes && waited < maxWaitMs && stalled < 5) {
      System.gc()
      Thread.sleep(2000); waited += 2000
      val next = debrisBytes()
      stalled = if (next >= cur) stalled + 1 else 0
      cur = next
    }
    cur
  }
}
