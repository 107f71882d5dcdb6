package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing guarantees: identical texts share all fingerprints; texts
  * sharing a long substring share fingerprints; unrelated texts share few.
  */
class WinnowSpec extends AnyFunSuite with SparkSuite {

  private def fingerprints(dir: String): Map[Long, Set[Long]] =
    quality.TextOps.winnowFingerprints(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  private lazy val plantedDir: String = {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    def words(n: Int) = Seq.fill(n)(s"tok${rng.nextInt(5000)}").mkString(" ")
    val shared = words(30)
    val t0 = words(60)
    val docs = Seq(
      (0L, t0, "en", "s", 0L),
      (1L, words(60), "en", "s", 0L),
      (2L, words(20) + " " + shared + " " + words(20), "en", "s", 0L),
      (3L, words(25) + " " + shared + " " + words(15), "en", "s", 0L),
      (4L, t0, "en", "s", 0L)) // exact copy of doc 0
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("identical docs share all fingerprints; overlapping docs share many; unrelated few") {
    val fps = fingerprints(plantedDir)
    assert(fps(0L) == fps(4L)) // exact copy
    val overlap23 = fps(2L).intersect(fps(3L)).size.toDouble /
      math.min(fps(2L).size, fps(3L).size)
    assert(overlap23 > 0.3, s"shared-substring overlap $overlap23")
    val overlap01 = fps(0L).intersect(fps(1L)).size.toDouble /
      math.min(fps(0L).size, fps(1L).size)
    assert(overlap01 < 0.2, s"unrelated overlap $overlap01")
  }

  test("fingerprints are non-empty and bounded by text length") {
    val fps = fingerprints(sf)
    assert(fps.nonEmpty)
    fps.values.foreach(s => assert(s.nonEmpty))
  }

  test("x5 scalar projection agrees with the fingerprint sets") {
    val scalars = SparkEntry.queries("x5_winnow_fingerprint")(spark, plantedDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val raw = fingerprints(plantedDir)
    assert(scalars.keySet == raw.keySet)
    raw.foreach { case (id, s) => assert(scalars(id)._1 == s.size.toLong) }
    // digest of identical fp sets matches; differing sets differ
    assert(scalars(0L)._2 == scalars(4L)._2)
    assert(scalars(0L)._2 != scalars(1L)._2)
  }
}
