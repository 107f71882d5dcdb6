package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Executable sf10 parity for the oracle-intractable heavy families —
  * turning GenScale's construction argument ("sf10 is `copies`
  * key-shifted FK-consistent copies of sf1.0, so per-shard results are
  * derivable from the sf1.0 runs the oracle verified") into a
  * measurement (SCALING.md §shard-parity).
  *
  * What is asserted, per family:
  *
  *   - NO CROSS-SHARD LEAKAGE — every output row's keys lie in ONE
  *     shard's key range. This is the load-bearing scale claim: a pair/
  *     cluster/component that crossed shards would mean the family
  *     manufactures relationships between unrelated sub-corpora.
  *   - SHARD-0 EQUALITY — sf10's results restricted to shard 0 equal the
  *     standalone sf1.0 run EXACTLY (shard 0 is sf1.0 verbatim: no key
  *     shift, no text mutation), proving per-shard results are
  *     independent of the other nine shards' presence.
  *   - TEN-WAY SHARD IDENTITY (text-free families: v7, g1b) — every
  *     shard's result, un-shifted back to shard-0 coordinates, is
  *     bit-identical to shard 0's: the copies are isomorphic structures,
  *     so the family must not care WHICH key range it runs in. (g1b's
  *     rank constant S div N is global, so sf1.0 equality does not apply
  *     — the 10-way identity is the exact invariant the construction
  *     provides.)
  *
  * For the HASH-REALIZATION families (dd2/dd6) shards c > 0 are reported
  * but not asserted equal: GenScale's token mutation is a per-copy token
  * BIJECTION, which preserves every token-set Jaccard exactly but not
  * the minhash REALIZATION (different token strings hash to different
  * lattice points, so borderline band collisions flip) — per-shard pair
  * counts land close, and the check prints them for the record.
  *
  * Usage: `runMain graft.tools.ShardParity [sf1Dir] [sf10Dir]`.
  * Exits non-zero on any failed assertion.
  */
object ShardParity {

  private var failures = 0

  private def check(name: String, ok: Boolean, detail: => String = ""): Unit = {
    if (!ok) failures += 1
    println(s"[parity] ${if (ok) "PASS" else "FAIL"} $name" +
      (if (ok || detail.isEmpty) "" else s" — $detail"))
  }

  private def equalSets(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  def main(args: Array[String]): Unit = {
    val sf1 = args.lift(0).getOrElse("testdata/sf1.0")
    val sf10 = args.lift(1).getOrElse("testdata/sf10")
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
      .appName("graft-shard-parity").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      run(spark, sf1, sf10)
      if (failures > 0) {
        println(s"[parity] $failures FAILED")
        sys.exit(1)
      }
      println("[parity] all assertions passed")
    } finally spark.stop()
  }

  def run(spark: SparkSession, sf1: String, sf10: String): Unit = {
    def span(dir: String, table: String, key: String): Long =
      Tables(spark, dir, table).agg(max(col(key))).head().getLong(0) + 1L
    val D = span(sf1, "documents", "doc_id")
    val C = span(sf1, "customer", "c_custkey")
    val S = span(sf1, "supplier", "s_suppkey")
    val P = span(sf1, "part", "p_partkey")
    val copies = (span(sf10, "documents", "doc_id") / D).toInt
    println(s"[parity] spans: doc=$D cust=$C supp=$S part=$P copies=$copies")

    // ---- dd2: minhash+LSH near-dup pairs (a, b, est_jaccard) ----------
    locally {
      val r1 = graft.quality.DedupOps.minhashPairs(spark, sf1, minEstJaccard = 0.8)
        .localCheckpoint(true)
      val r10 = graft.quality.DedupOps.minhashPairs(spark, sf10, minEstJaccard = 0.8)
        .localCheckpoint(true)
      check("dd2 zero cross-shard pairs",
        r10.filter(floor(col("a") / D) =!= floor(col("b") / D)).isEmpty)
      check("dd2 shard-0 == standalone sf1.0",
        equalSets(r10.filter(col("a") < D && col("b") < D), r1))
      val perShard = r10.groupBy(floor(col("a") / D).as("shard")).count()
        .orderBy("shard").collect().map(r => r.getLong(1))
      println(s"[parity] dd2 per-shard pair counts (c>0 informative — " +
        s"token bijection preserves Jaccard, not minhash realization): " +
        perShard.mkString(","))
    }

    // ---- dd6: dedup clusters (doc_id, cluster_rep) --------------------
    locally {
      val r1 = graft.quality.DedupOps.dedupClusters(spark, sf1, minEstJaccard = 0.95)
        .localCheckpoint(true)
      val r10 = graft.quality.DedupOps.dedupClusters(spark, sf10, minEstJaccard = 0.95)
        .localCheckpoint(true)
      check("dd6 zero cross-shard cluster membership",
        r10.filter(floor(col("doc_id") / D) =!= floor(col("cluster_rep") / D)).isEmpty)
      check("dd6 shard-0 == standalone sf1.0",
        equalSets(r10.filter(col("doc_id") < D), r1))
      val sizes = r10.groupBy(floor(col("doc_id") / D).as("shard"))
        .agg(countDistinct("cluster_rep").as("n_clusters"))
        .orderBy("shard").collect().map(_.getLong(1))
      println(s"[parity] dd6 per-shard cluster counts: ${sizes.mkString(",")}")
    }

    // ---- v7: voxel instances over the (partkey, suppkey) grid ---------
    locally {
      def v7(dir: String) = graft.SparkEntry.queries("v7_voxel_instances")(spark, dir)
      val r1 = v7(sf1).localCheckpoint(true)
      val r10 = v7(sf10).localCheckpoint(true)
      // shard of an instance = its ix range; the packed id shifts
      // uniformly by c·(P·1e6 + S) because both coordinates translate
      val shard: Column = floor(col("min_ix") / P)
      check("v7 zero cross-shard components",
        r10.filter(floor(col("min_ix") / P) =!= floor(col("max_ix") / P) ||
          floor(col("min_iy") / S) =!= floor(col("max_iy") / S)).isEmpty)
      val unshifted = r10.select(
        (col("instance") - shard * (P * 1000000L + S)).as("instance"),
        col("n_vox"),
        (col("min_ix") - shard * P).as("min_ix"),
        (col("max_ix") - shard * P).as("max_ix"),
        (col("min_iy") - shard * S).as("min_iy"),
        (col("max_iy") - shard * S).as("max_iy"),
        shard.as("shard")).localCheckpoint(true)
      check("v7 shard-0 == standalone sf1.0",
        equalSets(unshifted.filter(col("shard") === 0).drop("shard"), r1))
      val distinctShardResults = unshifted
        .groupBy("instance", "n_vox", "min_ix", "max_ix", "min_iy", "max_iy")
        .agg(count(lit(1)).as("n"))
      check(s"v7 ten-way shard identity (every un-shifted row appears $copies times)",
        distinctShardResults.filter(col("n") =!= copies).isEmpty,
        s"rows not shared by all $copies shards: " +
          distinctShardResults.filter(col("n") =!= copies).count().toString)
    }

    // ---- g1b: bucketed PageRank (node_id, rank_units) -----------------
    locally {
      val r10 = graft.SparkEntry.queries("g1b_pagerank_bucketed")(spark, sf10)
        .localCheckpoint(true)
      // node encoding: even = 2·custkey, odd = 2·suppkey + 1; un-shift
      // within each id class
      val shard: Column = when(col("node_id") % 2 === 0,
        floor(col("node_id") / lit(2L) / C))
        .otherwise(floor((col("node_id") - 1) / lit(2L) / S))
      val unshifted = r10.select(
        when(col("node_id") % 2 === 0, col("node_id") - shard * 2L * C)
          .otherwise(col("node_id") - shard * 2L * S).as("node_id"),
        col("rank_units"), shard.as("shard")).localCheckpoint(true)
      val distinctRows = unshifted.groupBy("node_id", "rank_units")
        .agg(count(lit(1)).as("n"))
      check(s"g1b ten-way shard identity (rank constant S div N is global, " +
        s"so the exact invariant is cross-shard, not vs sf1.0)",
        distinctRows.filter(col("n") =!= copies).isEmpty,
        s"rows not shared by all $copies shards: " +
          distinctRows.filter(col("n") =!= copies).count().toString)
    }
  }
}
