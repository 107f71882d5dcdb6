package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.quality.DedupOps

/** Stage-level cost decomposition for dd13_cross_decontam — the evidence
  * behind COVERAGE.md §dd13 ("where does the per-doc cost go"). Times,
  * isolated (1 untimed warm-up + reps timed, min reported, the Bench
  * protocol):
  *
  *   - full_query        — the benched dd13 path end to end (store
  *                         pre-staged by the warm-up, as in steady state)
  *   - identity_content  — the per-run corpus content digest the
  *                         pre-round-11 path paid (md5+crc32 full eval
  *                         text scan)
  *   - identity_snapshot — the metadata snapshot identity that replaced
  *                         it (one FS listing)
  *   - train_md5         — the exact-tier hash pass over the train side
  *   - train_minhash     — tokenize + 32-way minhash over the train side
  *                         (the irreducible sketch work: every new train
  *                         doc must be sketched exactly once per run)
  *   - stage_eval_once   — one-time eval store stage into a fresh dir
  *                         (amortized per eval release, not per run)
  *
  * The probe/verdict tail (band equi-join + agreement filter + verdict
  * union/sort) is full_query minus the train passes it contains — the
  * stages above are measured independently so the subtraction is stated,
  * not implied. Usage: `runMain graft.tools.Dd13Profile <sfDir> [reps]`.
  */
object Dd13Profile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("testdata/sf1.0")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("graft.scan.fanout", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-dd13-profile").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, sfDir, reps)
    finally spark.stop()
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def run(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    val docs = Tables(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val evalDocs = docs.filter(col("doc_id") % 2 === 1)
    val nDocs = docs.count()
    println(s"[dd13prof] sfDir=$sfDir docs=$nDocs reps=$reps")
    force(docs) // page-cache + footer warm, not charged to any stage

    def time(name: String)(f: => Unit): Double = {
      f // warm-up, untimed
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[dd13prof] $name%-18s min=${ts.min}%7.2f s  " +
        s"reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }

    val storeRoot = graft.etl.ScratchDirs.keyed("dd13_prof_store", sfDir)
    val snapId = DedupOps.sourceSnapshotIdentity(spark, evalDocs,
      derivationTag = "documents:parity=odd")
    val full = time("full_query") {
      force(DedupOps.contaminationVerdicts(spark, train, evalDocs,
        storePath = Some(storeRoot), evalIdentity = Some(snapId)))
    }

    // per-JOB breakdown of one full run: the query executes as a strict
    // job sequence (eager checkpoints + the final write), so job wall
    // times ARE the stage decomposition — no code duplication, no
    // instrumented twin that could drift from the real dataflow
    locally {
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val done = new java.util.ArrayList[(Int, Double, String)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(e.stageInfos.lastOption.map(_.name)).getOrElse("?")
          jobs.put(e.jobId, (e.time, desc.take(100))): Unit
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobs.remove(e.jobId)).foreach { case (t0, desc) =>
            done.synchronized {
              done.add((e.jobId, (e.time - t0) / 1e3, desc)): Unit
            }
          }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        force(DedupOps.contaminationVerdicts(spark, train, evalDocs,
          storePath = Some(storeRoot), evalIdentity = Some(snapId)))
        Thread.sleep(500) // listener bus drains asynchronously
        import scala.jdk.CollectionConverters._
        done.asScala.sortBy(_._1).foreach { case (id, sec, desc) =>
          println(f"[dd13prof]   job $id%3d ${sec}%7.2f s  $desc")
        }
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val idContent = time("identity_content") {
      DedupOps.corpusFingerprint(evalDocs): Unit
    }
    val idSnap = time("identity_snapshot") {
      DedupOps.sourceSnapshotIdentity(spark, evalDocs,
        derivationTag = "documents:parity=odd"): Unit
    }
    val md5T = time("train_md5") {
      force(train.select(col("doc_id"), md5(col("text")).as("m")))
    }
    val sigT = time("train_minhash") {
      force(DedupOps.minhashSignaturesOf(spark, train))
    }
    // one-time stage, fresh dir per rep so every rep pays the real write
    var k = 0
    val stageT = time("stage_eval_once") {
      k += 1
      DedupOps.writeFingerprintStore(spark, evalDocs,
        java.nio.file.Files.createTempDirectory("dd13_stage").toString + s"/v$k",
        identity = s"prof$k")
    }
    val tail = full - md5T - sigT
    println(f"[dd13prof] ---- summary (min-of-$reps, seconds) ----")
    println(f"[dd13prof] full=$full%.2f  = train_md5 $md5T%.2f + " +
      f"train_minhash $sigT%.2f + probe/verdict tail ~$tail%.2f")
    println(f"[dd13prof] identity: content $idContent%.2f (pre-r11 per-run) " +
      f"vs snapshot $idSnap%.3f (current per-run)")
    println(f"[dd13prof] stage_eval_once=$stageT%.2f (per eval release, not per run)")
    println(f"[dd13prof] us_per_train_doc=${full / (nDocs / 2.0) * 1e6}%.1f")
  }
}
