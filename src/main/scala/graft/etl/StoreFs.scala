package graft.etl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` layer for persisted-store maintenance (the dd9/
  * dd13 fingerprint store, k8 compaction): every exists/rename/delete/
  * listing the maintenance protocols run goes through the scheme-aware
  * `org.apache.hadoop.fs` API instead of `java.io.File`, so a store can
  * live wherever a 100 TB corpus's fingerprints must live — HDFS, an
  * object store, or `file:` — with ONE code path (DedupSpec drives the
  * crash/compaction/parity suite through an explicit `file:`-scheme URI).
  *
  * Atomicity inventory, per filesystem class (SCALING.md §store-commit):
  *   - `file:` / HDFS — `rename` is atomic; the aside-rename swap
  *     (live→_old, tmp→live) guarantees a complete table at every
  *     instant, and [[Marker]] makes the INITIAL multi-table stage
  *     all-or-nothing for readers.
  *   - object stores (s3a: …) — rename is copy+delete, NOT atomic. The
  *     marker protocol still makes the initial stage safe (readers
  *     require the marker, committed strictly after every table), but
  *     in-place maintenance swaps must not run there: write a NEW
  *     immutable `v<N>` version subdir and commit ITS marker — that
  *     single new-object create is the version flip, resolved by
  *     [[committedVersions]] (the scaladoc on
  *     [[graft.quality.DedupOps.compactFingerprintStore]]'s swap — at
  *     deployment scale the flip is a metastore/table-format pointer,
  *     which is exactly what this marker is a minimal stand-in for).
  */
object StoreFs {

  /** Name of the store-level commit marker: present ⇔ every table of the
    * store was completely written at some point (and any later
    * maintenance kept the either-old-or-new swap invariant). Committed
    * strictly AFTER the data writes, so a reader — in this process or
    * another — can never mistake a half-staged store for a real one.
    */
  val Marker = "_STAGED"

  /** Name of the per-version writer-claim file: created with
    * create-exclusive semantics BEFORE any data is staged into `v<N>`,
    * so exactly one writer ever writes a given version number — the
    * missing CAS in the read-versions-then-stage protocol (two
    * concurrent compactors/restagers could both elect `v<N+1>`, write
    * interleaved part files into the SAME directory, and "commit" a
    * silently mixed table). Carries the owner's identity for
    * post-mortems. Invisible to [[committedVersions]] (which tests only
    * [[Marker]]) and harmless to readers (it sits beside the table
    * dirs, not inside them).
    */
  val Claim = "_CLAIM"

  def fs(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sparkContext.hadoopConfiguration)

  def exists(fs: FileSystem, path: String): Boolean = fs.exists(new Path(path))

  /** Rename that reports failure like `java.io.File.renameTo` (false on
    * any non-exceptional failure) — callers turn it into a loud error
    * with protocol context.
    */
  def rename(fs: FileSystem, from: String, to: String): Boolean =
    fs.rename(new Path(from), new Path(to))

  def deleteRecursive(fs: FileSystem, path: String): Unit = {
    fs.delete(new Path(path), true): Unit
  }

  /** (path, bytes) of the data files directly under `path` — the
    * metadata listing compaction sizes its output from (never a data
    * scan).
    */
  def parquetFiles(fs: FileSystem, path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.toString, st.getLen))
  }

  /** Commit the store marker with an identity payload (e.g. the staged
    * corpus fingerprint) — the LAST write of a stage. Overwrites any
    * prior marker; create-then-close is the object-store-safe commit
    * (a marker object either exists complete or not at all).
    */
  def commitMarker(fs: FileSystem, storePath: String, identity: String): Unit =
    writeSmall(fs, new Path(storePath, Marker), identity)

  /** The committed identity payload, or None if the store was never
    * fully staged (or a maintenance protocol that invalidates markers
    * is mid-flight).
    */
  def readMarker(fs: FileSystem, storePath: String): Option[String] =
    readSmall(fs, new Path(storePath, Marker))

  /** Version numbers of the COMMITTED `v<N>` subdirs of a versioned
    * store (the object-store maintenance path, SCALING.md
    * §store-commit), ascending. Committed = the subdir carries its
    * [[Marker]]; since the marker is written strictly after the
    * version's tables, creating it IS the atomic version flip — the
    * live root is simply the highest committed version (no mutable
    * pointer object anywhere, so nothing is ever overwritten: a
    * create-then-close of a NEW small object is the one primitive that
    * is atomic-and-all-or-nothing on `file:`, HDFS, and object stores
    * alike, where an overwritten pointer would be truncate-then-write
    * on file:/HDFS with a visible empty window). Markerless `v<N>`
    * debris from a crashed maintenance run is invisible here; version
    * numbers are claimed exclusively and NEVER reused ([[claimVersion]]
    * — the next writer claims a fresh number), so debris keeps its
    * number until the prune path reclaims it once its claim ages out
    * ([[graft.quality.DedupOps.pruneStoreVersions]]). Empty ⇔ the store root itself is the
    * live (flat v0) layout, which keeps every pre-versioning store
    * readable. This listing-resolution is the HadoopCatalog-style
    * minimal stand-in for a metastore/catalog pointer; the listing is
    * one metadata call over a handful of subdirs, never a data scan.
    */
  def committedVersions(fs: FileSystem, storePath: String): Seq[Int] = {
    val p = new Path(storePath)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.stripPrefix("v").toInt)
      .filter(n => fs.exists(new Path(s"$storePath/v$n", Marker)))
      .sorted
  }

  /** Filesystem schemes whose create-exclusive is a REAL atomic CAS:
    * POSIX `O_EXCL` on `file:` (via `File.createNewFile` — see
    * [[claimVersion]]), an atomic namespace create on HDFS/viewfs.
    * Default S3A `create(overwrite = false)` is NOT in this set on
    * purpose: it is check-then-act (existence probed at `create()`, the
    * PUT happens at `close()`), so two concurrent claimants can both
    * "win" — exactly the shared-staging-dir corruption the claim
    * prevents. A deployment whose client DOES offer a conditional
    * create (S3 If-None-Match via a conditional-write-enabled
    * connector, GCS preconditions, ABFS lease/etag) opts its scheme in
    * with [[trustClaimScheme]]; otherwise the claim is a metastore CAS
    * and this file-based stand-in must not pretend to provide it.
    */
  private val atomicClaimSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  Seq("file", "hdfs", "viewfs").foreach(atomicClaimSchemes.add)

  /** Opt a scheme into [[claimVersion]]'s CAS after verifying the
    * deployment's client performs a true conditional create there.
    */
  def trustClaimScheme(scheme: String): Unit = {
    atomicClaimSchemes.add(scheme.toLowerCase): Unit
  }

  /** Atomically claim exclusive write ownership of `v<n>` under
    * `storePath`. True ⇔ THIS caller created the claim file via a REAL
    * create-exclusive (POSIX `O_EXCL` on `file:`, an atomic namespace
    * create on HDFS). False ⇔ another writer holds the version number;
    * callers move to the next number ([[claimNextVersion]]) — the
    * lose-cleanly path, never a shared staging dir. Fails LOUDLY on a
    * scheme not known to offer atomic create-exclusive (default S3A's
    * `create(overwrite=false)` is check-then-act — see
    * [[trustClaimScheme]] for the opt-in): a claim that can silently
    * double-grant is worse than no claim at all.
    */
  def claimVersion(fs: FileSystem, storePath: String, n: Int,
      owner: String): Boolean = {
    require(atomicClaimSchemes.contains(fs.getScheme.toLowerCase),
      s"claimVersion on scheme '${fs.getScheme}': create(overwrite=false) " +
        "is not known to be an atomic create-exclusive there (default S3A " +
        "is check-then-act). Use a metastore CAS for version claims, or " +
        "opt the scheme in with StoreFs.trustClaimScheme after verifying " +
        "the client performs a true conditional create.")
    val dir = new Path(s"$storePath/v$n")
    fs.mkdirs(dir): Unit // mkdirs is idempotent; the CLAIM create is the race decider
    val p = new Path(dir, Claim)
    val won =
      if (fs.getScheme == "file")
        // RawLocalFileSystem's create(overwrite=false) is check-then-act;
        // java.io.File.createNewFile is the real O_EXCL atomic create
        new java.io.File(p.toUri.getPath).createNewFile()
      else
        try { fs.create(p, false).close(); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException => false
        }
    if (won) writeSmall(fs, p, owner) // exclusively ours now — record who
    won
  }

  /** Modification time of `v<n>`'s claim file, if present — the age
    * signal debris reclamation gates on ([[graft.quality.DedupOps.pruneStoreVersions]]):
    * a markerless version dir whose claim is RECENT is an in-flight
    * writer still staging, not debris.
    */
  def claimMtime(fs: FileSystem, storePath: String, n: Int): Option[Long] = {
    val p = new Path(s"$storePath/v$n", Claim)
    // one call, exception-mapped: an exists-then-stat pair races a
    // concurrent prune deleting the claim between the two
    try Some(fs.getFileStatus(p).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }
  }

  /** Heartbeat an already-won claim: refresh `v<n>/_CLAIM`'s mtime so
    * [[graft.quality.DedupOps.pruneStoreVersions]]' age gate keeps treating this stage as
    * in-flight. Writers call it between long staging steps (one table
    * write apart), bounding how stale a LIVE claim can look regardless
    * of total stage duration — the advisory race where a stage
    * legitimately outlives `claimGraceMs` and gets reclaimed mid-write.
    * `setTimes` where the filesystem supports it; payload rewrite as the
    * fallback (we already own the claim — overwriting our own file is
    * safe, and on object stores the rewrite IS the mtime update).
    */
  def touchClaim(fs: FileSystem, storePath: String, n: Int): Unit = {
    val p = new Path(s"$storePath/v$n", Claim)
    try fs.setTimes(p, System.currentTimeMillis(), -1)
    catch {
      case _: UnsupportedOperationException =>
        val owner = try {
          val in = fs.open(p)
          try new String(in.readAllBytes(), StandardCharsets.UTF_8)
          finally in.close()
        } catch { case _: java.io.IOException => ownerId() }
        writeSmall(fs, p, owner)
      case _: java.io.FileNotFoundException => // claim pruned under us:
        // nothing to heartbeat — the commit-marker write will surface the
        // torn stage to resolution (markerless dir), not hide it
    }
  }

  /** First version number ≥ `from` this writer exclusively claims.
    * Bounded: pathological contention (or a filesystem whose
    * create-exclusive lies) fails loudly instead of spinning.
    */
  def claimNextVersion(fs: FileSystem, storePath: String, from: Int,
      owner: String, maxAttempts: Int = 64): Int = {
    var k = from
    while (k < from + maxAttempts) {
      if (claimVersion(fs, storePath, k, owner)) return k
      k += 1
    }
    throw new IllegalStateException(
      s"could not claim a store version under $storePath after " +
        s"$maxAttempts attempts from v$from — writer contention or a " +
        "filesystem without create-exclusive semantics")
  }

  /** Default owner identity for version claims: host, pid, thread. */
  def ownerId(): String =
    s"${java.net.InetAddress.getLocalHost.getHostName}:" +
      s"${ProcessHandle.current().pid()}:t${Thread.currentThread().getId}"

  /** Auxiliary small-object write riding a version commit (e.g. the
    * stream maintainer's epoch-state sidecar, [[graft.streaming
    * .IvmStream]]) — written into the staged `v<N>` dir strictly BEFORE
    * its marker, so the marker flip publishes them together.
    */
  def writeAux(fs: FileSystem, dir: String, name: String,
      payload: String): Unit = writeSmall(fs, new Path(dir, name), payload)

  def readAux(fs: FileSystem, dir: String, name: String): Option[String] =
    readSmall(fs, new Path(dir, name))

  private def writeSmall(fs: FileSystem, p: Path, payload: String): Unit = {
    val out = fs.create(p, true)
    try out.write(payload.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSmall(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
}
