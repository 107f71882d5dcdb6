package graft

import graft.streaming.HeavyHitterStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streamed == batch law for the sharded Misra–Gries stream, plus
  * the tight-capacity bound the open-vocabulary regime relies on.
  */
class HeavyHitterStreamSpec extends AnyFunSuite with SparkSuite {

  /** Stage documents as 3 chunk files so maxFilesPerTrigger=1 forces a
    * multi-batch replay (the summary must survive state round-trips).
    */
  private def stageChunks(): String = {
    val staging = java.nio.file.Files.createTempDirectory("hh_stage").toString
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(staging)
    }
    staging
  }

  private def latestPerShard(table: String): Map[String, Long] = {
    val rows = spark.table(table).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val lastSeq = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val fin = rows.filter { case (s, q, _, _) => q == lastSeq(s) }
    // shards partition the token space — a token must appear in ONE shard
    val byTok = fin.groupBy(_._3)
    byTok.foreach { case (t, g) =>
      assert(g.map(_._1).distinct.length == 1, s"token $t in multiple shards")
    }
    byTok.view.mapValues(_.head._4).toMap
  }

  test("streamed MG summary equals the exact batch counts when capacity covers the vocabulary") {
    val staging = stageChunks()
    HeavyHitterStream.runToCompletion(spark, staging, "hh_exact", k = 64)
    val streamed = latestPerShard("hh_exact")
    val exact = Tables(spark, sf, "documents")
      .select(explode_outer(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == exact,
      s"streamed summary differs from exact counts (${streamed.size} vs ${exact.size} tokens)")
    // and therefore the streamed top-20 IS the x16 batch answer
    val batchTop = SparkEntry.queries("x16_heavy_hitters")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val streamTop = streamed.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    assert(streamTop == batchTop, "streamed top-20 != batch x16 top-20")
  }

  test("tight-capacity stream keeps the deterministic MG bound per shard") {
    val staging = stageChunks()
    val k = 4
    HeavyHitterStream.runToCompletion(spark, staging, "hh_tight", k = k, shards = 4)
    val streamed = latestPerShard("hh_tight")
    val exactByTok = Tables(spark, sf, "documents")
      .select(explode_outer(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token").isNotNull && col("token") =!= "")
      .withColumn("shard", pmod(xxhash64(col("token")), lit(4)).cast("int"))
      .groupBy("shard", "token").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val nPerShard = exactByTok.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    streamed.foreach { case (tok, est) =>
      val shard = exactByTok.keys.find(_._2 == tok).get._1
      val truth = exactByTok((shard, tok))
      assert(est <= truth, s"$tok: est $est above true $truth")
      assert(est >= truth - nPerShard(shard) / (k + 1),
        s"$tok: est $est below the MG floor for true $truth")
    }
    // every shard-heavy item (true > N_shard/(k+1)) must survive
    exactByTok.foreach { case ((shard, tok), truth) =>
      if (truth > nPerShard(shard) / (k + 1))
        assert(streamed.contains(tok), s"heavy token $tok evicted")
    }
  }
}
