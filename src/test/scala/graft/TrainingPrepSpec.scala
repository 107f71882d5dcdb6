package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-independent invariants of the training-prep operators (their
  * value-level parity is oracle-checked; these pin the semantic laws).
  */
class TrainingPrepSpec extends AnyFunSuite with SparkSuite {

  test("x19 chunk windows cover every token with the promised overlap") {
    val win = 128L
    val stride = 64L
    val chunks = quality.TextOps.chunkWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val nTokens = SparkEntry.queries("x1_token_count")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.map(_._1).toSet == nTokens.keySet, "docs lost or invented")
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nTokens(doc)
      // chunk ids dense from 0; starts advance by exactly the stride
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until cs.length).toSeq)
      sorted.foreach { case (_, i, start, len, text) =>
        assert(start == i * stride + 1)
        assert(len == math.min(win, n - i * stride), s"doc $doc chunk $i length")
        // the text really holds `len` whitespace tokens
        assert(text.split("\\s+").count(_.nonEmpty) == len, s"doc $doc chunk $i text")
      }
      // full coverage: the last chunk reaches the final token, and no
      // chunk starts beyond it
      val (_, _, lastStart, lastLen, _) = sorted.last
      assert(lastStart + lastLen - 1 == n, s"doc $doc: tail token uncovered")
      // the second-to-last chunk (if any) did NOT already cover the end —
      // i.e. the chunk count is minimal for this (win, stride)
      if (cs.length > 1) assert(sorted(cs.length - 2)._3 + win - 1 < n)
    }
  }

  test("x7 packing conserves documents and tokens per shard") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val expected = docs.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tok"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val packed = quality.TextOps.qs.find(_.name == "x7_seq_packing").get.fn(spark, sf)
      .groupBy("shard")
      .agg(sum("n_docs").as("n_docs"), sum("pack_tokens").as("tok"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(packed == expected)
  }

  test("x7 pack ids start at 0, distinct, increasing within each shard") {
    // pack = exclusive-prefix-sum div 2048, so a single document longer
    // than one pack legitimately SKIPS pack ids — density is not part of
    // the contract (it only held by accident of the corpus). The contract
    // is: first pack is 0 (prefix sum starts at 0) and ids are distinct
    // and increasing.
    val packs = quality.TextOps.qs.find(_.name == "x7_seq_packing").get.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    packs.groupBy(_._1).foreach { case (shard, ps) =>
      val ids = ps.map(_._2).sorted.toSeq
      assert(ids.nonEmpty && ids.head == 0L && ids.distinct == ids,
        s"shard $shard packs ${ids.mkString(",")}")
    }
  }

  test("cleaned-corpus export: partitioned write prunes partitions on read-back") {
    val survivors = quality.DedupOps.dedupClusters(spark, sf, minEstJaccard = 0.95)
      .filter(col("doc_id") === col("cluster_rep"))
      .select("doc_id")
    val out = java.nio.file.Files.createTempDirectory("clean_corpus").toString + "/corpus"
    graft.Tables(spark, sf, "documents")
      .join(survivors, "doc_id")
      .write.partitionBy("lang").option("compression", "gzip").parquet(out)
    spark.catalog.clearCache()
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected lang partition pruning in:\n${plan.take(800)}")
    // the pruned read returns exactly the English survivors
    val expected = graft.Tables(spark, sf, "documents")
      .join(survivors, "doc_id").filter(col("lang") === "en").count()
    assert(back.count() == expected && expected > 0)
  }

  test("nn4 reconstruction error is bounded by half a quantization step") {
    val rows = quality.SimilarityOps.qs.find(_.name == "nn4_int8_quant").get.fn(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val maxErr = r.getDouble(2)
      val mse = r.getDouble(3)
      val bound = 0.5 / scale * (1 + 1e-9)
      assert(maxErr <= bound, s"vec ${r.getLong(0)}: $maxErr > $bound")
      assert(mse <= maxErr * maxErr + 1e-12)
    }
  }
}
