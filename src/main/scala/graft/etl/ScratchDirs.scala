package graft.etl

import java.nio.file.{Files, LinkOption, Paths}
import java.nio.file.attribute.PosixFilePermissions

/** Hardened per-user scratch directories for queries that must persist an
  * artifact mid-plan (the K1 export round-trip, the dd9 fingerprint
  * store). One FIXED dir per (tag, source sfDir), overwritten each run — a
  * fresh createTempDirectory would leak a full artifact copy into /tmp on
  * every Verify/Bench execution. The path is keyed on an md5 of the
  * ABSOLUTE source path (hashCode could collide two sfDirs into one
  * silently-shared dir) and lives under a per-user 0700 subdirectory (a
  * predictable world-shared /tmp name is symlink-squattable on multi-user
  * hosts). Two JVMs working on the SAME sfDir concurrently still share the
  * dir — an accepted trade for not leaking an artifact copy per run.
  */
object ScratchDirs {

  /** Absolute path of `tmpdir/graft_<user>/<tag>_<md5(abs source)>`,
    * with the per-user root created 0700 after symlink/ownership checks.
    */
  def keyed(tag: String, sourceDir: String): String = {
    val abs = new java.io.File(sourceDir).getAbsolutePath
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val userRoot = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_${System.getProperty("user.name")}")
    // The predictable name must not be FOLLOWED if an attacker planted
    // something there first: refuse a symlink (mkdirs/chmod would
    // dereference it and write through the attacker's target) and a
    // directory owned by someone else; only then create/chmod 0700.
    require(!Files.isSymbolicLink(userRoot),
      s"$userRoot is a symlink — refusing to write through it")
    Files.createDirectories(userRoot)
    val owner = Files.getOwner(userRoot, LinkOption.NOFOLLOW_LINKS).getName
    require(owner == System.getProperty("user.name"),
      s"$userRoot is owned by $owner, not the current user — refusing to write")
    try Files.setPosixFilePermissions(userRoot,
      PosixFilePermissions.fromString("rwx------"))
    catch { case _: UnsupportedOperationException => () } // non-POSIX FS
    new java.io.File(userRoot.toFile, s"${tag}_$digest").getAbsolutePath
  }

  /** As [[keyed]], but with any previous run's content DELETED first —
    * for artifacts that must start EMPTY, e.g. a streaming checkpoint:
    * resuming from a leftover run's offsets would silently skip the very
    * backlog the caller asked to replay. Still a fixed path, so repeated
    * runs overwrite one directory instead of accumulating temp dirs.
    */
  def freshKeyed(tag: String, sourceDir: String): String = {
    val path = keyed(tag, sourceDir)
    def rm(f: java.io.File): Unit = {
      val children = if (Files.isSymbolicLink(f.toPath)) null else f.listFiles()
      if (children != null) children.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(path))
    path
  }
}
