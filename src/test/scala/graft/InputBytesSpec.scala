package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins for the fan-out gate's size probe (`Tables.inputBytes`,
  * verdict r15 #7 + ADVICE r15): the Hadoop-FS rewrite must (a) recurse
  * into nested directories — the shallow java.io sum read a
  * Hive-partitioned layout (subdirectories only) as 0 bytes and failed
  * the gate CLOSED for an arbitrarily large table — and (b) resolve
  * non-`file://` schemes through the Hadoop FileSystem registry, so the
  * gate is real off local disk (the old probe returned Long.MaxValue for
  * every remote path, leaving the gate inert). Missing paths still fail
  * OPEN (Long.MaxValue keeps the repartition).
  */
class InputBytesSpec extends AnyFunSuite with SparkSuite {

  private def mkTree(): (java.io.File, Long) = {
    val root = java.nio.file.Files.createTempDirectory("graft_ib").toFile
    val sub = new java.io.File(root, "event_date=2001-01-01")
    sub.mkdirs()
    java.nio.file.Files.write(new java.io.File(sub, "a.parquet").toPath,
      Array.fill[Byte](1000)(1))
    java.nio.file.Files.write(new java.io.File(root, "b.parquet").toPath,
      Array.fill[Byte](234)(2))
    (root, 1234L)
  }

  test("recurses into nested (Hive-partitioned) directories; missing path fails open") {
    val (root, bytes) = mkTree()
    assert(Tables.inputBytes(spark, root.getAbsolutePath) == bytes)
    assert(Tables.inputBytes(spark, new java.io.File(root, "nope").getAbsolutePath)
      == Long.MaxValue)
    val plain = new java.io.File(root, "b.parquet")
    assert(Tables.inputBytes(spark, plain.getAbsolutePath) == 234L)
  }

  test("inputStat reports file counts (the round-16 fan-out splittability gate)") {
    val (root, bytes) = mkTree()
    assert(Tables.inputStat(spark, root.getAbsolutePath) == ((bytes, 2L)))
    assert(Tables.inputStat(spark,
      new java.io.File(root, "b.parquet").getAbsolutePath) == ((234L, 1L)))
    // missing path fails open: size MaxValue, ONE file (so a positive
    // fan-out conf keeps the repartition, the pre-gate behavior)
    assert(Tables.inputStat(spark,
      new java.io.File(root, "nope").getAbsolutePath) == ((Long.MaxValue, 1L)))
  }

  test("resolves an hdfs-style scheme through the Hadoop FS registry") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockdfs.impl", classOf[MockDfs].getName)
    val (root, bytes) = mkTree()
    assert(Tables.inputBytes(spark, s"mockdfs://ns${root.getAbsolutePath}") == bytes)
    assert(Tables.inputBytes(spark, s"mockdfs://ns${root.getAbsolutePath}/nope")
      == Long.MaxValue)
  }
}

/** A local-disk FileSystem registered under a remote-looking scheme —
  * enough to prove the gate probes through the Hadoop registry rather
  * than java.io.
  */
class MockDfs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockdfs://ns/")
  override def getScheme: String = "mockdfs"
}
