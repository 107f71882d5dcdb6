package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.etl.{IvmOps, StoreFs}

/** Streaming twin of the ivm1 incremental-view refresh: order deltas
  * arrive continuously and each micro-batch folds into the persisted
  * per-custkey aggregate view, rolling the store forward one committed
  * version per applied batch under the [[StoreFs]] claim→stage→marker
  * protocol (the same object-store-safe flip the dd9/dd13 fingerprint
  * stores use).
  *
  * Exactly-once WITHOUT a consumer-side dedup: unlike the dd9 stream
  * (whose output is an append log, so at-least-once appends are healed
  * downstream on (batch_id, doc_id)), a maintained VIEW cannot tolerate
  * a replayed fold — the same delta added twice is silent corruption.
  * The classical foreachBatch fix is a transactional sink keyed on
  * batchId, and the version marker already IS that transaction record:
  * each applied batch commits its version with identity `batch:<id>`,
  * and a replayed batch (crash after the marker flip, before the
  * checkpoint commit) finds its own id on the LIVE version and skips
  * the fold. Micro-batches apply in order and replays re-run only the
  * last uncommitted batch, so checking the live version's identity is
  * sufficient — no scan of older markers. A crash BEFORE the marker
  * flip leaves markerless `v<N>` debris, invisible to
  * [[StoreFs.committedVersions]]; the replay claims the next number
  * (lose-cleanly, never a shared dir) and `pruneStoreVersions`
  * retention reclaims history.
  *
  * Scale shape per batch: one view-key shuffle over |batch| + |view|
  * rows (the ivm1 merge), one metadata listing to resolve the live
  * version — the base fact stream is never re-read.
  */
object IvmStream {

  /** Arriving order-delta schema (the insert-only changelog). */
  val orderSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_totalprice", DoubleType)))

  /** Canonical on-disk view schema: the sum partial pinned at
    * DECIMAL(38,4) so every version carries ONE type — an uncast chain
    * would widen 28,4 → 38,4 on the first merge and drift the store
    * schema across versions.
    */
  def canonical(view: DataFrame): DataFrame =
    view.select(col("o_custkey"),
      col("n_orders").cast("long").as("n_orders"),
      col("sum_dec").cast(DecimalType(38, 4)).as("sum_dec"),
      col("min_price"), col("max_price"))

  /** The live (highest committed) view version, if any. */
  def liveView(s: SparkSession, storePath: String): Option[(Int, DataFrame)] = {
    val fs = StoreFs.fs(s, storePath)
    StoreFs.committedVersions(fs, storePath).lastOption
      .map(n => (n, s.read.parquet(s"$storePath/v$n/view")))
  }

  /** Arriving CDC-adjustment schema: each row is one changelog op's
    * group-algebra contribution (insert (+1, +price), update (0, Δprice),
    * delete (-1, -price)) — the ivm2 vocabulary as a stream.
    */
  val cdcSchema: StructType = StructType(Seq(
    StructField("o_custkey", LongType),
    StructField("dn", LongType),
    StructField("ds", DecimalType(28, 4))))

  /** The CDC twin of [[viewRefreshStream]]: micro-batches of signed
    * (Δcount, Δsum) adjustments fold into the (o_custkey, n_orders,
    * sum_dec) view via the ivm2 retraction algebra — groups retracting
    * to zero membership leave the view. Same versioned store roll and
    * marker-identity exactly-once.
    */
  /** @param registerBase see [[viewRefreshStream]] — the CDC view
    *   carries (o_custkey, n_orders, sum_dec) only, so routed reads are
    *   those the rewrite can type-match against that narrower store.
    */
  def cdcRefreshStream(spark: SparkSession, inDir: String, storePath: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1,
      onBatchCommitted: Long => Unit = _ => (),
      registerBase: Option[String] = None): StreamingQuery = {
    spark.readStream
      .schema(cdcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fs = StoreFs.fs(s, storePath)
        val live = StoreFs.committedVersions(fs, storePath).lastOption
        val alreadyApplied = live.exists(n =>
          StoreFs.readMarker(fs, s"$storePath/v$n")
            .contains(s"batch:$batchId"))
        if (!alreadyApplied) {
          val store = live match {
            case Some(n) => s.read.parquet(s"$storePath/v$n/view")
            case None => s.createDataFrame(
              s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(Seq(
                StructField("o_custkey", LongType),
                StructField("n_orders", LongType),
                StructField("sum_dec", DecimalType(38, 4)))))
          }
          val newView = IvmOps.refreshWithRetractions(store, batch)
            .select(col("o_custkey"),
              col("n_orders").cast("long").as("n_orders"),
              col("sum_dec").cast(DecimalType(38, 4)).as("sum_dec"))
          val vn = StoreFs.claimNextVersion(fs, storePath,
            from = live.getOrElse(0) + 1, owner = StoreFs.ownerId())
          newView.write.mode("overwrite").parquet(s"$storePath/v$vn/view")
          StoreFs.commitMarker(fs, s"$storePath/v$vn", s"batch:$batchId")
        }
        reRegister(s, registerBase, storePath)
        onBatchCommitted(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Re-point the MV rewrite at the latest committed view version — the
    * read-side half of stream maintenance. Without this, a view the
    * stream keeps perfectly fresh on disk serves STALE answers through
    * [[graft.plans.MvRegistry]]: registration pins the view's file
    * listing, so it must re-run after every version flip (the batch
    * path's unregister→rebuild→register protocol, IvmOps.ivm3). Called
    * in foreachBatch strictly AFTER the marker commit — and also on the
    * replay-skip path, which heals a crash that died between the flip
    * and the registration. Readers planned against the previous version
    * keep a complete immutable dir (never deleted under the retention
    * window), so a routed read is stale by AT MOST one version and
    * never torn.
    */
  private def reRegister(s: SparkSession, registerBase: Option[String],
      storePath: String): Unit =
    registerBase.foreach { bp =>
      val fs = StoreFs.fs(s, storePath)
      StoreFs.committedVersions(fs, storePath).lastOption.foreach { n =>
        graft.plans.MvRegistry.register(s, bp, s"$storePath/v$n/view")
      }
    }

  /** Arriving FULL-CDC schema: the ivm2b vocabulary as a stream — each
    * row one changelog op's group-algebra contribution plus the
    * value-level removed/added columns MIN/MAX maintenance needs
    * (insert (+1, +p, null, p), update (0, Δ, old, new),
    * delete (−1, −p, p, null)).
    */
  val fullCdcSchema: StructType = StructType(Seq(
    StructField("o_custkey", LongType),
    StructField("dn", LongType),
    StructField("ds", DecimalType(28, 4)),
    StructField("v_removed", DoubleType),
    StructField("v_added", DoubleType)))

  /** The ivm2b twin of [[cdcRefreshStream]]: maintain the FULL view —
    * count/sum via retraction algebra AND min/max via the group-scoped
    * recompute — from a continuous changelog.
    *
    * @param baseSnapshotFor batchId → the base-table state CONSISTENT
    *   WITH the changelog up to and including that batch — the
    *   correctness keystone, made structural on purpose: reading "the
    *   live base path" here would tear a version whenever the producer
    *   runs ahead of the fold (base already reflects batch N+1 while
    *   this fold commits batch N's view: a recomputed group's min/max
    *   would disagree with the version's own count/sum). At deployment
    *   the base is a versioned/snapshot table and the changelog carries
    *   the base version each batch corresponds to (the standard CDC
    *   watermark), so the provider is a time-travel read; a pipeline
    *   whose producer NEVER runs ahead may return the live path.
    *   [[graft.etl.IvmOps.refreshWithRetractionsFull]] reads the
    *   snapshot ONLY through the extremum-touched-group semi-join, so a
    *   batch that never removes a stored extremum never touches the
    *   base at all — per batch that is one view-key shuffle plus,
    *   rarely, the touched groups' buckets.
    *
    * Same versioned store roll and marker-identity exactly-once as the
    * other twins; `registerBase` wires the read side (the full view
    * carries every column the MvRewrite vocabulary knows, so routed
    * reads type-match all four aggregates).
    */
  def fullCdcRefreshStream(spark: SparkSession, inDir: String,
      storePath: String, baseSnapshotFor: Long => DataFrame,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      onBatchCommitted: Long => Unit = _ => (),
      registerBase: Option[String] = None): StreamingQuery = {
    spark.readStream
      .schema(fullCdcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fs = StoreFs.fs(s, storePath)
        val live = StoreFs.committedVersions(fs, storePath).lastOption
        val alreadyApplied = live.exists(n =>
          StoreFs.readMarker(fs, s"$storePath/v$n")
            .contains(s"batch:$batchId"))
        if (!alreadyApplied) {
          val store = live match {
            case Some(n) => s.read.parquet(s"$storePath/v$n/view")
            case None => s.createDataFrame(
              s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              StructType(Seq(
                StructField("o_custkey", LongType),
                StructField("n_orders", LongType),
                StructField("sum_dec", DecimalType(38, 4)),
                StructField("min_price", DoubleType),
                StructField("max_price", DoubleType))))
          }
          val currentRows = baseSnapshotFor(batchId)
            .select(col("o_custkey"), col("o_totalprice").as("v"))
          val newView = IvmOps.refreshWithRetractionsFull(store, batch, currentRows)
            .select(col("o_custkey"),
              col("n_orders").cast("long").as("n_orders"),
              col("sum_dec").cast(DecimalType(38, 4)).as("sum_dec"),
              col("min_price"), col("max_price"))
          val vn = StoreFs.claimNextVersion(fs, storePath,
            from = live.getOrElse(0) + 1, owner = StoreFs.ownerId())
          newView.write.mode("overwrite").parquet(s"$storePath/v$vn/view")
          StoreFs.commitMarker(fs, s"$storePath/v$vn", s"batch:$batchId")
        }
        reRegister(s, registerBase, storePath)
        onBatchCommitted(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Start the continuous view-maintenance query over parquet order
    * deltas landing in `inDir`. `onBatchCommitted` fires after the
    * version-marker flip and before foreachBatch returns — the
    * crash window the spec uses to prove replay idempotence.
    *
    * @param registerBase base-table path to keep registered in
    *   [[graft.plans.MvRegistry]] against the live view version (see
    *   [[reRegister]]); None leaves the read side untouched. Freshness
    *   contract: a routed read reflects every batch whose foreachBatch
    *   has completed — files landed but not yet folded are the usual MV
    *   staleness window, identical to the batch path's.
    */
  def viewRefreshStream(spark: SparkSession, inDir: String, storePath: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1,
      onBatchCommitted: Long => Unit = _ => (),
      registerBase: Option[String] = None): StreamingQuery = {
    spark.readStream
      .schema(orderSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fs = StoreFs.fs(s, storePath)
        val live = StoreFs.committedVersions(fs, storePath).lastOption
        val alreadyApplied = live.exists(n =>
          StoreFs.readMarker(fs, s"$storePath/v$n")
            .contains(s"batch:$batchId"))
        if (!alreadyApplied) {
          val newView = canonical(live match {
            case Some(n) =>
              IvmOps.refreshInsertOnly(s.read.parquet(s"$storePath/v$n/view"), batch)
            case None => IvmOps.orderPartials(batch)
          })
          val vn = StoreFs.claimNextVersion(fs, storePath,
            from = live.getOrElse(0) + 1, owner = StoreFs.ownerId())
          newView.write.mode("overwrite").parquet(s"$storePath/v$vn/view")
          StoreFs.commitMarker(fs, s"$storePath/v$vn", s"batch:$batchId")
        }
        reRegister(s, registerBase, storePath)
        onBatchCommitted(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
