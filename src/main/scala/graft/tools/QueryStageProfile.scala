package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Generic stage-level cost profile for one SparkEntry query — the
  * map-vs-shuffle split behind SCALING.md adjudications (round-11 first
  * use: x5's "where does the per-doc cost live" watchlist item). Runs
  * the query once untimed (warm-up) and once instrumented, then prints
  * each STAGE's executor-run time, input/shuffle volumes, and name —
  * executor runtime attributes cost to the right side of each exchange,
  * which wall-clock job timings cannot.
  *
  * Usage: `runMain graft.tools.QueryStageProfile <query> [sfDir]`.
  */
object QueryStageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("testdata/sf1.0")
    val cpus = 32
    // same startup hygiene as Bench: rm dead-session orphans directly,
    // then scope settle's gauge to this session's own debris
    locally {
      val freed = Reclaim.purgeOrphans()
      if (freed > 0)
        System.err.println(f"# purged ${freed / 1e9}%.1f GB orphaned scratch")
    }
    Reclaim.markForeign()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.scan.fanout", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-stage-profile").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      def run(): Unit = graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // SPARK_GRAFT_QSP_WARMUP=0 profiles the COLD run: at sf100 the
      // warm-up+instrumented double-run is memory/disk-marginal (the
      // first v7 attempt died on ENOSPC under the warm-up's debris, a
      // retry on Tungsten page contention), and the campaign numbers
      // being decomposed are themselves cold-start walls — a cold
      // stage table attributes them more faithfully than a warm one.
      if (sys.env.getOrElse("SPARK_GRAFT_QSP_WARMUP", "1") == "1") {
        run() // warm-up, unrecorded
        // reclaim the warm-up's shuffle debris BEFORE the instrumented
        // run: at sf100 two back-to-back heavy runs stack past the
        // sandbox disk (round 14, verdict #2)
        spark.catalog.clearCache()
        val left = Reclaim.settle(floorBytes = 4L << 30)
        System.err.println(f"# post-warm-up debris: ${left / 1e9}%.1f GB")
      }
      val stages = mutable.ArrayBuffer[(Int, Double, Double, Long, Long, Long, String)]()
      // per-stage task skew: count + max single-task runtime (a stage
      // whose wall ≈ its max task is a straggler, not a volume problem)
      val taskMax = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Double)]()
      val listener = new SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val dt = Option(e.taskMetrics).map(_.executorRunTime / 1e3).getOrElse(0.0)
          taskMax.merge(e.stageId, (1, dt),
            (a, b) => (a._1 + b._1, math.max(a._2, b._2))): Unit
        }
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val i = e.stageInfo
          val m = i.taskMetrics
          stages.synchronized {
            stages += ((i.stageId,
              m.executorRunTime / 1e3,
              (for { s <- i.submissionTime; c <- i.completionTime } yield (c - s) / 1e3)
                .getOrElse(-1.0),
              m.inputMetrics.bytesRead,
              m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten,
              i.name.take(90))): Unit
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drains asynchronously
      spark.sparkContext.removeSparkListener(listener)
      println(f"[stageprof] $name wall=${wall}%.2f s (1 instrumented run after warm-up)")
      println("[stageprof] stage  execRun(s)  wall(s)  input(MB)  shufRead(MB)  shufWrite(MB)  tasks  maxTask(s)  name")
      val snap = stages.synchronized(stages.sortBy(_._1).toVector)
      snap.foreach { case (id, er, w, in, sr, sw, nm) =>
        val (nt, mx) = Option(taskMax.get(id)).getOrElse((0, 0.0))
        println(f"[stageprof] $id%5d  ${er}%9.2f  ${w}%7.2f  ${in / 1e6}%9.1f  " +
          f"${sr / 1e6}%12.1f  ${sw / 1e6}%13.1f  $nt%5d  ${mx}%9.2f  $nm")
      }
      val totalExec = snap.map(_._2).sum
      val shuffleExec = snap.filter(t => t._5 > 0).map(_._2).sum
      println(f"[stageprof] total executor-run=${totalExec}%.2f s across " +
        f"${snap.size} stages; stages reading a shuffle account for " +
        f"${shuffleExec}%.2f s")
    } finally spark.stop()
  }
}
