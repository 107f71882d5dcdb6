package graft

import graft.quality.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x17b/x18b — the scale variants of the per-language window family —
  * against their exact twins: both variants are fully DuckDB-oracled
  * (deterministic bins / hash thresholds), so correctness is the
  * driver's job; THESE tests bound how far the scale approximation can
  * drift from the exact windowed answer, which is the contract a user
  * switching x17→x17b at 100× needs.
  */
class QualityScaleSpec extends AnyFunSuite with SparkSuite {

  test("x17b histogram buckets agree with the exact ntile buckets except near tercile boundaries") {
    val exact = SparkEntry.queries("x17_quality_buckets")(spark, sf)
      .select(col("doc_id"), col("bucket").as("b_exact"))
    val hist = TextOps.qualityBucketsHist(spark, sf)
      .select(col("doc_id"), col("bucket").as("b_hist"))
    val joined = exact.join(hist, "doc_id").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(joined.nonEmpty)
    // only docs in a tercile-straddling histogram bin can differ; with
    // 1024 bins and continuous-valued scores that is a sliver of each
    // language — bound the total disagreement at 5%
    val disagree = joined.count { case (a, b) => a != b }
    info(s"x17b/x17 disagreement: $disagree of ${joined.length}")
    assert(disagree <= joined.length * 0.05,
      s"histogram buckets diverge from exact terciles on $disagree of ${joined.length}")
    // and a disagreement is always between ADJACENT buckets — a bin
    // cannot straddle two tercile boundaries unless a whole tercile
    // fits inside one of 1024 bins
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    assert(joined.forall { case (a, b) => math.abs(order(a) - order(b)) <= 1 },
      "non-adjacent bucket disagreement")
  }

  test("w3b histogram tiles agree with w3's exact ntile except in tile-straddling bins") {
    val exact = SparkEntry.queries("w3_ntile")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hist = SparkEntry.queries("w3b_ntile_hist")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.keySet == exact.keySet)
    // recompute each customer's bin to pin the exact disagreement
    // contract: a row may differ only if its bin straddles a tile
    // boundary, and then only within the bin's exact-tile span (±1 for
    // the n%4 ntile-edge offset)
    val bals = spark.read.parquet(s"$sf/customer.parquet")
      .selectExpr("c_custkey", "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lo = bals.values.min; val hi = bals.values.max
    val binOf = bals.map { case (k, b) => k -> ((b - lo) * 1024) / (hi - lo + 1) }
    val span = exact.keys.groupBy(binOf).map { case (bin, ks) =>
      bin -> (ks.map(exact).min, ks.map(exact).max)
    }
    var disagree = 0
    exact.keys.foreach { k =>
      val (sLo, sHi) = span(binOf(k))
      if (hist(k) != exact(k)) disagree += 1
      assert(hist(k) >= sLo - 1 && hist(k) <= sHi + 1,
        s"customer $k: hist tile ${hist(k)} outside bin span [$sLo, $sHi]±1")
    }
    info(s"w3b/w3 disagreement: $disagree of ${exact.size}")
  }

  test("x18b threshold selection lands within binomial range of x18's exact per-language quota") {
    val exactCounts = SparkEntry.queries("x18_temperature_mixture")(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("keep_n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotCounts = TextOps.temperatureThreshold(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCounts.keySet == exactCounts.keySet,
      s"language sets differ: ${gotCounts.keySet} vs ${exactCounts.keySet}")
    exactCounts.foreach { case (lang, keepN) =>
      val got = gotCounts(lang)
      // selection is Binomial(n_lang, keep_n/n_lang): mean keep_n,
      // sd ≤ sqrt(keep_n) — allow 5 sd plus slack for tiny languages
      val tol = math.max(15.0, 5.0 * math.sqrt(keepN.toDouble))
      info(s"$lang: exact quota $keepN, threshold kept $got (tol ±$tol)")
      assert(math.abs(got - keepN) <= tol,
        s"$lang: threshold selection $got vs exact quota $keepN exceeds ±$tol")
    }
  }

  test("x23: reduced-k dsir cut with a planted weight tie straddling the boundary") {
    import spark.implicits._
    // seven identical docs (identical gram multiset ⇒ identical DSIR
    // weight) plus one distinct doc: whichever side of the tie group
    // the lone doc sorts to, positions k-1 and k of the (weight desc,
    // doc_id) order both land INSIDE the tie group at k=3, so the cut
    // is decided by the doc_id tiebreak alone — the exact edge the
    // deterministic ORDER BY exists for.
    val docs = ((1 to 7).map(i =>
      (i.toLong, "en", "alpha beta gamma delta epsilon")) :+
      (8L, "en", "totally different words here now")).toDF("doc_id", "lang", "text")
    val k = 3
    val res = TextOps.dsirSelectOf(spark, docs, k = k)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(res.length == 8)
    val byCut = res.sortBy { case (id, w, _) => (-w, id) }
    val tied = res.filter(_._1 <= 7).map(_._2).distinct
    assert(tied.length == 1, s"identical docs must tie exactly, got $tied")
    assert(byCut(k - 1)._2 == byCut(k)._2,
      "fixture must place a weight tie exactly at the k boundary")
    val kept = res.filter(_._3).map(_._1).toSet
    assert(kept == byCut.take(k).map(_._1).toSet,
      s"kept set $kept must be the top-$k by (weight desc, doc_id)")
    assert(kept.size == k)
  }
}
