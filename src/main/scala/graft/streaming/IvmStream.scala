package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.etl.{IvmOps, StoreFs, ViewSpec}

/** Streaming twin of the ivm1 incremental-view refresh: deltas arrive
  * continuously and each micro-batch folds into the persisted per-key
  * aggregate view, rolling the store forward one committed version per
  * applied batch under the [[StoreFs]] claim→stage→marker protocol (the
  * same object-store-safe flip the dd9/dd13 fingerprint stores use).
  *
  * Every stream is a function of the DECLARED [[ViewSpec]] (round 12,
  * completing the batch side's lift): the changelog schemas, the store
  * schema, the canonical on-disk cast, and the registered rewrite
  * vocabulary all derive from the spec, so maintaining a second view
  * (ivm5's lineitem-by-partkey) as a stream is a declaration — the
  * orders-view values below are the original spec's instances, kept as
  * the default-parameter surface. One typing posture is assumed, the
  * repo-wide one: BIGINT group keys, DOUBLE extremum sources
  * (ViewSpec's own contract), exact-decimal sum partials.
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

  private val PartialWide = DecimalType(38, 4)
  private val DeltaDec = DecimalType(28, 4)

  /** Arriving order-delta schema (the insert-only changelog) — the
    * Orders-spec instance of an insert schema: the key, the sum/extremum
    * source columns, plus the fact's own key the partials ignore. Kept
    * for callers; [[viewRefreshStream]] now derives its default from the
    * spec via [[deltaSchemaFor]].
    */
  val orderSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_totalprice", DoubleType)))

  /** The insert-delta schema a declared view implies: the group key plus
    * every declared sum/extremum SOURCE column — exactly what
    * [[graft.etl.IvmOps.partials]] reads, under the repo-wide typing
    * posture (BIGINT keys, DOUBLE numeric sources). This is
    * [[viewRefreshStream]]'s default so spec and schema cannot drift: a
    * caller passing a non-Orders spec and forgetting the schema
    * previously read the input under the ORDERS schema — every declared
    * column resolved to null and the stream silently committed garbage
    * partials. Deriving from the spec removes the failure mode; an
    * explicitly passed schema is validated against the spec instead.
    */
  def deltaSchemaFor(v: ViewSpec): StructType = {
    val numSrcs = (v.sums.map(_.src) ++ v.exts.map(_.src)).distinct
    // distinct-count-only sources are identity-valued (the common
    // count(DISTINCT key)-like shape) — BIGINT under the repo posture;
    // a dist source that also feeds a sum/extremum keeps DOUBLE
    val distOnly = v.dists.map(_.src).distinct.filterNot(numSrcs.contains)
    StructType(StructField(v.groupCol, LongType) +:
      (numSrcs.map(c => StructField(c, DoubleType)) ++
        distOnly.map(c => StructField(c, LongType))))
  }

  /** Guard for an explicitly passed delta schema: it must carry the
    * spec's group key and every declared source column, else the scan
    * would null-fill what the fold aggregates (see [[deltaSchemaFor]]).
    *
    * The typing posture is a CONTRACT, not a convention: the store
    * schema is derived as BIGINT key / DOUBLE numeric sources /
    * BIGINT-or-DOUBLE distinct-only sources (ViewSpec's repo-wide
    * posture), so a delta schema typing a declared column differently
    * would fold mistyped partials. Columns whose type upcasts
    * LOSSLESSLY to the posture (int→bigint, float→double — the
    * schemas that worked through canonicalFor's casts before this
    * guard existed) are accepted with the cast returned for the caller
    * to insert; genuinely incompatible types still fail loudly at
    * stream start (the type-mismatch cousin of the null-fill drift
    * [[deltaSchemaFor]] eliminated). Round 15, advisor low: the
    * initial guard rejected the upcastable schemas too — a behavior
    * regression for existing callers, not a hardening.
    *
    * @return the scan schema plus the (column → posture type) casts to
    *   apply before folding.
    */
  private def requireCoversSpec(schema: StructType,
      v: ViewSpec): (StructType, Seq[(String, DataType)]) = {
    val numSrcs = (v.sums.map(_.src) ++ v.exts.map(_.src)).distinct
    val distOnly = v.dists.map(_.src).distinct.filterNot(numSrcs.contains)
    val needed = v.groupCol +: (numSrcs ++ distOnly)
    val missing = needed.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"delta schema ${schema.fieldNames.mkString("(", ",", ")")} is missing " +
        s"columns ${missing.mkString(", ")} declared by view spec $v")
    def upcasts(from: DataType, to: DataType): Boolean = (from, to) match {
      case (ByteType | ShortType | IntegerType, LongType) => true
      case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
      case _ => false
    }
    val casts = Seq.newBuilder[(String, DataType)]
    val bad = Seq.newBuilder[String]
    def slot(c: String, targets: Seq[DataType]): Unit = {
      val t = schema(c).dataType
      if (!targets.contains(t)) targets.find(upcasts(t, _)) match {
        case Some(tt) => casts += (c -> tt)
        case None => bad += s"$c: ${t.sql}"
      }
    }
    slot(v.groupCol, Seq(LongType))
    numSrcs.foreach(slot(_, Seq(DoubleType)))
    distOnly.foreach(slot(_, Seq(LongType, DoubleType)))
    val badSrcs = bad.result()
    require(badSrcs.isEmpty,
      s"view spec $v requires the repo-wide typing posture — BIGINT group " +
        s"key, DOUBLE sum/extremum sources, BIGINT/DOUBLE distinct " +
        s"sources (or types that upcast losslessly to them); got " +
        badSrcs.mkString(", ") +
        ". Declare differently-typed columns via a pre-cast on the delta " +
        "producer, or extend ViewSpec with per-column types.")
    (schema, casts.result())
  }

  /** CDC-adjustment schema for a declared view: the group key, the
    * count-arity delta `dn`, and one exact-decimal delta column per
    * declared sum — the ivm2 vocabulary as a stream.
    */
  def cdcSchemaFor(v: ViewSpec): StructType = StructType(
    StructField(v.groupCol, LongType) +: StructField(v.dn, LongType) +:
      v.sums.map(sc => StructField(sc.delta, DeltaDec)))

  /** [[cdcSchemaFor]] plus the value-level removed/added columns MIN/MAX
    * maintenance needs (insert (+1, +p, null, p), update (0, Δ, old,
    * new), delete (−1, −p, p, null)) — the ivm2b vocabulary, one
    * removed/added pair PER extremum source ([[ViewSpec.removedFor]];
    * single-source views keep the bare pair unchanged).
    */
  def fullCdcSchemaFor(v: ViewSpec): StructType = StructType(
    cdcSchemaFor(v).fields.toSeq ++ v.extSrcs.flatMap(s => Seq(
      StructField(v.removedFor(s), DoubleType),
      StructField(v.addedFor(s), DoubleType))))

  /** The on-disk store schema a declared view maintains; `withExts`
    * false for the count/sum-only CDC stream.
    */
  private def storeSchemaFor(v: ViewSpec, withExts: Boolean): StructType =
    StructType(
      (StructField(v.groupCol, LongType) +:
        StructField(v.countOut, LongType) +:
        v.sums.map(sc => StructField(sc.out, PartialWide))) ++
        (if (withExts) v.exts.map(e => StructField(e.out, DoubleType))
         else Nil) ++
        v.dists.map(dc => StructField(dc.out, LongType)))

  /** Canonical on-disk view cast: the sum partials pinned at
    * DECIMAL(38,4) so every version carries ONE type — an uncast chain
    * would widen 28,4 → 38,4 on the first merge and drift the store
    * schema across versions.
    */
  def canonicalFor(view: DataFrame, v: ViewSpec,
      withExts: Boolean = true): DataFrame =
    view.select(col(v.groupCol) +:
      (col(v.countOut).cast("long").as(v.countOut) +:
        (v.sums.map(sc => col(sc.out).cast(PartialWide).as(sc.out)) ++
          (if (withExts) v.exts.map(e => col(e.out)) else Nil) ++
          v.dists.map(dc => col(dc.out).cast("long").as(dc.out)))): _*)

  /** The Orders-spec instance (original surface, kept for callers). */
  val cdcSchema: StructType = cdcSchemaFor(ViewSpec.Orders)
  val fullCdcSchema: StructType = fullCdcSchemaFor(ViewSpec.Orders)
  def canonical(view: DataFrame): DataFrame =
    canonicalFor(view, ViewSpec.Orders)

  /** The live (highest committed) view version, if any. */
  def liveView(s: SparkSession, storePath: String): Option[(Int, DataFrame)] = {
    val fs = StoreFs.fs(s, storePath)
    StoreFs.committedVersions(fs, storePath).lastOption
      .map(n => (n, s.read.parquet(s"$storePath/v$n/view")))
  }

  private def emptyStore(s: SparkSession, v: ViewSpec,
      withExts: Boolean): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      storeSchemaFor(v, withExts))

  /** One exactly-once versioned fold: resolve the live version, skip if
    * this batchId already committed it, else stage `next(liveStore)` as
    * the claimed next version and flip its marker — the shared
    * transaction skeleton of all three streams. `next` receives None
    * when no committed version exists yet (first batch).
    */
  private def foldVersioned(s: SparkSession, storePath: String,
      batchId: Long, v: ViewSpec, withExts: Boolean,
      // builder receives (live store, live version number) and returns
      // the next view PLUS any side TABLES that must commit with it
      // (e.g. the declared-distinct pair stores, keyed by subdir name) —
      // all written into the staged v<N> dir strictly before its
      // marker, so the flip publishes view + side tables + sidecars as
      // one transaction
      next: Option[(DataFrame, Int)] => (DataFrame, Map[String, DataFrame]),
      aux: Option[Int] => Map[String, String] = _ => Map.empty): Unit = {
    val fs = StoreFs.fs(s, storePath)
    val live = StoreFs.committedVersions(fs, storePath).lastOption
    val alreadyApplied = live.exists(n =>
      StoreFs.readMarker(fs, s"$storePath/v$n").contains(s"batch:$batchId"))
    if (!alreadyApplied) {
      val store = live.map(n => (s.read.parquet(s"$storePath/v$n/view"), n))
      val (built, sideTables) = next(store)
      val newView = canonicalFor(built, v, withExts)
      val vn = StoreFs.claimNextVersion(fs, storePath,
        from = live.getOrElse(0) + 1, owner = StoreFs.ownerId())
      newView.write.mode("overwrite").parquet(s"$storePath/v$vn/view")
      sideTables.foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$storePath/v$vn/$name") }
      aux(live).foreach { case (name, payload) =>
        StoreFs.writeAux(fs, s"$storePath/v$vn", name, payload) }
      StoreFs.commitMarker(fs, s"$storePath/v$vn", s"batch:$batchId")
    }
  }

  /** Sidecar carrying the epoch state of the base files FOLDED into a
    * version (insert-only stream, base == delta dir): `"<xorOfTerms>
    * <fileCount>"` per [[graft.plans.MvRegistry.fileTerm]] /
    * `epochFromState`. Accumulated per batch from the micro-batch's OWN
    * input-file set — never from a directory listing — so the
    * registered epoch reflects exactly the files whose rows are in the
    * view. A file that lands between the batch's source snapshot and
    * registration is then NOT in the registered epoch; the live listing
    * disagrees and the rewrite disqualifies (falls back to the fresh
    * base scan) instead of serving a view missing that file's rows —
    * the round-13 TOCTOU, closed structurally: drift can only
    * disqualify, never falsely qualify.
    */
  private val EpochStateAux = "epochstate"

  private def parseEpochState(s: String): Option[(Long, Long)] =
    s.trim.split("\\s+") match {
      case Array(h, n) =>
        scala.util.Try((h.toLong, n.toLong)).toOption
      case _ => None
    }

  /** The micro-batch's own input-file PATHS, from the checkpoint's
    * file-source write-ahead log (`<ckpt>/sources/0/<batchId>`, written
    * at batch construction, strictly before foreachBatch runs). This is
    * the authoritative record — the batch DataFrame foreachBatch hands
    * over is a LogicalRDD whose file identity is erased, so
    * `inputFiles` is empty there. Format: a `v1` version line then one
    * JSON entry per file; every compact-interval batches the log writes
    * `<id>.compact` carrying ALL entries so far tagged with their
    * batchId, so both layouts filter on `"batchId":<id>`. Returns None
    * when neither file exists (not yet written, or a non-file source) —
    * callers then skip the sidecar and the registration falls back to
    * the pre-fold-listing epoch.
    */
  private def batchInputPaths(s: SparkSession, checkpointDir: String,
      batchId: Long): Option[Seq[String]] = {
    val fs = StoreFs.fs(s, checkpointDir)
    val plain = new org.apache.hadoop.fs.Path(s"$checkpointDir/sources/0/$batchId")
    val compact =
      new org.apache.hadoop.fs.Path(s"$checkpointDir/sources/0/$batchId.compact")
    val p = if (fs.exists(plain)) Some(plain)
      else if (fs.exists(compact)) Some(compact) else None
    p.map { path =>
      val in = fs.open(path)
      val text = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
      val pathRe = """"path":"((?:[^"\\]|\\.)*)"""".r
      text.linesIterator
        .filter(l => l.startsWith("{") && l.contains(s""""batchId":$batchId"""))
        .flatMap(l => pathRe.findFirstMatchIn(l).map(m => jsonUnescape(m.group(1))))
        .toSeq
    }
  }

  /** Decode a JSON string-literal body. The WAL stores paths
    * JSON-escaped; hashing the ESCAPED form into `fileTerm` would
    * disagree with the listing side for any path the writer escapes
    * (backslash, quote, non-ASCII `\uXXXX`), silently breaking the
    * sidecar chain — safe direction (routing disqualifies), but an
    * invisible perf regression (round 15, advisor low).
    */
  private[graft] def jsonUnescape(s: String): String = {
    if (!s.contains('\\')) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            val hex = s.substring(i + 2, i + 6)
            scala.util.Try(Integer.parseInt(hex, 16)).toOption match {
              case Some(cp) => out.append(cp.toChar); i += 6
              case None => out.append(c); i += 1 // malformed: keep literal
            }
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case other => out.append(other); i += 2 // \" \\ \/ and friends
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Fold this micro-batch's input files into the live version's epoch
    * state (see [[EpochStateAux]]); returns the sidecar payload for the
    * version this batch commits, or empty when the chain cannot be
    * maintained exactly (source log unavailable, a batch file already
    * deleted, or a live version missing its sidecar — e.g. a store that
    * predates the sidecar): a broken chain must surface as NO sidecar,
    * never as a wrong epoch, because registration then degrades to the
    * pre-fold-listing epoch instead of silently mis-fingerprinting.
    * Cost: one small sidecar read + one source-log read + one
    * getFileStatus per batch file — metadata-only, no data I/O.
    */
  private def epochStateAux(s: SparkSession, checkpointDir: String,
      batchId: Long, storePath: String,
      live: Option[Int]): Map[String, String] = {
    val fs = StoreFs.fs(s, storePath)
    val prev: Option[(Long, Long)] =
      if (live.isEmpty) Some((0L, 0L))
      else StoreFs.readAux(fs, s"$storePath/v${live.get}", EpochStateAux)
        .flatMap(parseEpochState)
    val folded = for {
      (h0, n0) <- prev
      paths <- batchInputPaths(s, checkpointDir, batchId)
      state <- scala.util.Try {
        var h = h0; var n = n0
        paths.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          if (graft.plans.MvRegistry.isDataFile(p.getName)) {
            val st = p.getFileSystem(s.sessionState.newHadoopConf())
              .getFileStatus(p)
            h ^= graft.plans.MvRegistry.fileTerm(p.toUri.getPath,
              st.getModificationTime, st.getLen)
            n += 1
          }
        }
        (h, n)
      }.toOption
    } yield state
    folded.map { case (h, n) => Map(EpochStateAux -> s"$h $n") }
      .getOrElse(Map.empty)
  }

  /** The CDC twin of [[viewRefreshStream]]: micro-batches of signed
    * (Δcount, Δsums) adjustments fold into the count/sum view via the
    * ivm2 retraction algebra — groups retracting to zero membership
    * leave the view. Same versioned store roll and marker-identity
    * exactly-once.
    *
    * @param registerBase see [[viewRefreshStream]] — the CDC view
    *   carries count/sum partials only, so routed reads are those the
    *   rewrite can type-match against that narrower store.
    */
  def cdcRefreshStream(spark: SparkSession, inDir: String, storePath: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1,
      onBatchCommitted: Long => Unit = _ => (),
      registerBase: Option[String] = None,
      spec: ViewSpec = ViewSpec.Orders): StreamingQuery = {
    // count/sum only: a CDC row carries no absolute values, so extrema
    // are not maintainable from it (that is fullCdcRefreshStream)
    val v = spec.copy(exts = Nil)
    spark.readStream
      .schema(cdcSchemaFor(v))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // pre-fold epoch capture: see reRegister (TOCTOU direction)
        val preEpoch = registerBase.map(bp =>
          graft.plans.MvRegistry.currentEpoch(s, bp))
        foldVersioned(s, storePath, batchId, v, withExts = false,
          store => (IvmOps.refreshWithRetractions(
            store.map(_._1).getOrElse(emptyStore(s, v, withExts = false)),
            batch, v), Map.empty))
        reRegister(s, registerBase, storePath, v, inDir, preEpoch)
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
    * window), so a routed read is never torn. With the mechanical
    * freshness gate ([[graft.plans.MvRegistry.lookupFresh]], round 13)
    * a routed read is never STALE either — and as of round 14 that
    * claim has no TOCTOU residue: the registered epoch is NEVER taken
    * from a post-fold listing of the live base dir (which would bake a
    * delta file landing mid-fold into the registration without its
    * rows in the view — lookupFresh would then falsely report the view
    * fresh). When the registered base IS the delta dir (the insert-only
    * stream), the epoch comes from the version's [[EpochStateAux]]
    * sidecar — exactly the files folded, accumulated from the
    * micro-batches' own input sets. When the base is a separate table
    * (the CDC twins), the epoch is the one captured BEFORE the fold
    * read the base (`preEpoch`). Either way a file landing after the
    * epoch's horizon makes the live listing disagree and DISQUALIFIES
    * the rewrite — the read falls back to the always-fresh base scan
    * until the next fold re-registers; a deployment preferring
    * view-cost reads with bounded staleness sets
    * `spark.graft.mv.freshnessIntervalMs`. Registers under the
    * stream's own spec, so routed reads type-match exactly the
    * vocabulary this stream maintains.
    */
  private def reRegister(s: SparkSession, registerBase: Option[String],
      storePath: String, spec: ViewSpec, inDir: String,
      preEpoch: Option[Long]): Unit =
    registerBase.foreach { bp =>
      val fs = StoreFs.fs(s, storePath)
      StoreFs.committedVersions(fs, storePath).lastOption.foreach { n =>
        val baseIsDeltaDir =
          new org.apache.hadoop.fs.Path(bp).toUri.getPath ==
            new org.apache.hadoop.fs.Path(inDir).toUri.getPath
        val epoch =
          if (baseIsDeltaDir)
            StoreFs.readAux(fs, s"$storePath/v$n", EpochStateAux)
              .flatMap(parseEpochState)
              .map { case (h, cnt) =>
                graft.plans.MvRegistry.epochFromState(h, cnt) }
          else preEpoch
        // When the base IS the delta dir, the sidecar is the ONLY epoch
        // source that cannot lie: preEpoch there is a pre-fold LISTING
        // of the live delta dir, which includes landed-but-unfolded
        // files (a maxFilesPerTrigger backlog) — registering with it
        // would report the view fresh while those files' rows are
        // missing (round 15, advisor medium). A legacy store without
        // the sidecar therefore registers NOTHING: routed reads fall
        // back to the always-fresh base scan (a pre-existing
        // registration's stale epoch already disqualifies itself) —
        // correct answers at base-scan cost until the store is rebuilt
        // from empty, where the chain starts at (0,0) and routing
        // returns.
        if (!baseIsDeltaDir || epoch.isDefined)
          graft.plans.MvRegistry.register(s, bp, s"$storePath/v$n/view", spec,
            baseEpoch = epoch)
      }
    }

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
    *   whose producer NEVER runs ahead may return the live path. The
    *   snapshot must arrive keyed (groupCol, value-col) per the spec's
    *   changelog vocabulary.
    *   [[graft.etl.IvmOps.refreshWithRetractionsFull]] reads the
    *   snapshot ONLY through the extremum-touched-group semi-join, so a
    *   batch that never removes a stored extremum never touches the
    *   base at all — per batch that is one view-key shuffle plus,
    *   rarely, the touched groups' buckets.
    *
    * Same versioned store roll and marker-identity exactly-once as the
    * other twins; `registerBase` wires the read side (the full view
    * carries every column the spec's MvRewrite vocabulary knows, so
    * routed reads type-match all its aggregates).
    */
  def fullCdcRefreshStream(spark: SparkSession, inDir: String,
      storePath: String, baseSnapshotFor: Long => DataFrame,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      onBatchCommitted: Long => Unit = _ => (),
      registerBase: Option[String] = None,
      spec: ViewSpec = ViewSpec.Orders): StreamingQuery = {
    spark.readStream
      .schema(fullCdcSchemaFor(spec))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // pre-fold epoch capture: see reRegister (TOCTOU direction)
        val preEpoch = registerBase.map(bp =>
          graft.plans.MvRegistry.currentEpoch(s, bp))
        foldVersioned(s, storePath, batchId, spec, withExts = true, store => {
          // normalize the snapshot to the changelog vocabulary, PER
          // extremum source: accept the declared raw source column or
          // its pre-normalized valueFor name. Collision rule (documented
          // contract): the DECLARED source wins when both are present —
          // a raw base snapshot that coincidentally carries a column
          // named `spec.valueFor(src)` (default "v") alongside the real
          // source must not be silently mis-normalized onto the
          // coincidental column; a frame is treated as pre-normalized
          // for a source only when that source's raw column is absent.
          val snap = baseSnapshotFor(batchId)
          require(spec.extSrcs.nonEmpty,
            s"full-CDC stream needs a declared extremum: $spec")
          val currentRows = snap.select(col(spec.groupCol) +:
            spec.extSrcs.map { src =>
              if (snap.columns.contains(src))
                col(src).as(spec.valueFor(src))
              else if (snap.columns.contains(spec.valueFor(src)))
                col(spec.valueFor(src))
              else throw new IllegalArgumentException(
                s"base snapshot carries neither the declared extremum " +
                  s"source '$src' nor the normalized value column " +
                  s"'${spec.valueFor(src)}': ${snap.columns.mkString(", ")}")
            }: _*)
          (IvmOps.refreshWithRetractionsFull(
            store.map(_._1).getOrElse(emptyStore(s, spec, withExts = true)),
            batch, currentRows, spec), Map.empty)
        })
        reRegister(s, registerBase, storePath, spec, inDir, preEpoch)
        onBatchCommitted(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Start the continuous view-maintenance query over parquet insert
    * deltas landing in `inDir`. `onBatchCommitted` fires after the
    * version-marker flip and before foreachBatch returns — the
    * crash window the spec uses to prove replay idempotence.
    *
    * @param deltaSchema the arriving fact-row schema (must carry the
    *   spec's group key and every declared sum/extremum source column —
    *   require-checked before the stream starts); defaults to the schema
    *   the spec itself implies ([[deltaSchemaFor]]), so spec and schema
    *   cannot drift apart. Extra columns (a fact key the partials
    *   ignore) are legal in an explicit schema.
    * @param registerBase base-table path to keep registered in
    *   [[graft.plans.MvRegistry]] against the live view version (see
    *   [[reRegister]]); None leaves the read side untouched. Freshness
    *   contract: a routed read reflects every batch whose foreachBatch
    *   has completed; files landed but not yet folded disqualify the
    *   rewrite through the epoch gate and the read falls back to the
    *   fresh base scan (see [[reRegister]]).
    */
  def viewRefreshStream(spark: SparkSession, inDir: String, storePath: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1,
      onBatchCommitted: Long => Unit = _ => (),
      registerBase: Option[String] = None,
      spec: ViewSpec = ViewSpec.Orders,
      deltaSchema: StructType = null): StreamingQuery = {
    // null default (not `= deltaSchemaFor(spec)`) so the derived/explicit
    // split stays visible at the call site in bytecode-stable form; both
    // paths land on a spec-covering schema — the explicit one by check
    val (schema, casts) = requireCoversSpec(
      Option(deltaSchema).getOrElse(deltaSchemaFor(spec)), spec)
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inDir)
    // lossless posture upcasts (int→bigint, float→double) the guard
    // accepted are inserted here, before the fold ever sees the batch
    val src = if (casts.isEmpty) raw else {
      val cm = casts.toMap
      raw.select(raw.columns.toSeq.map(c =>
        cm.get(c).map(t => raw.col(c).cast(t).as(c)).getOrElse(raw.col(c))): _*)
    }
    src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // pre-fold epoch capture — the fallback when the registered
        // base is NOT the delta dir; the delta-dir case registers from
        // the exact folded-file state instead (see reRegister)
        val preEpoch = registerBase.map(bp =>
          graft.plans.MvRegistry.currentEpoch(s, bp))
        foldVersioned(s, storePath, batchId, spec, withExts = true, {
          // first batch: the partials themselves seed the store (the
          // refresh over an empty store is value-identical but pays an
          // empty-side shuffle). A spec declaring distinct counts folds
          // its pair stores in the SAME version transaction — each
          // version carries `pairs_<out>` beside `view`, and the dist
          // output column re-derives from the refreshed pairs
          // (IvmOps.refreshInsertOnlyDistinct), so a routed
          // count(DISTINCT src) read stays exact at every version.
          case Some((store, n)) if spec.dists.nonEmpty =>
            val prevPairs = spec.dists.map(dc =>
              dc -> s.read.parquet(s"$storePath/v$n/pairs_${dc.out}"))
            val (view, newPairs) =
              IvmOps.refreshInsertOnlyDistinct(store, prevPairs, batch, spec)
            (view, newPairs.map { case (dc, df) =>
              s"pairs_${dc.out}" -> df }.toMap)
          case None if spec.dists.nonEmpty =>
            val pairs = spec.dists.map(dc =>
              dc -> IvmOps.distPartials(batch, spec, dc))
            (IvmOps.withDistincts(
              IvmOps.partials(batch, spec.copy(dists = Nil)), pairs, spec),
              pairs.map { case (dc, df) => s"pairs_${dc.out}" -> df }.toMap)
          case Some((store, _)) =>
            (IvmOps.refreshInsertOnly(store, batch, spec), Map.empty)
          case None => (IvmOps.partials(batch, spec), Map.empty)
        }, aux = live =>
          epochStateAux(s, checkpointDir, batchId, storePath, live))
        reRegister(s, registerBase, storePath, spec, inDir, preEpoch)
        onBatchCommitted(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
