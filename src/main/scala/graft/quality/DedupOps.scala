package graft.quality

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale: MinHash + banded LSH and SimHash
  * over the `documents` table. These are the unbounded-scale complements
  * to the bounded-block exact Jaccard in [[TextOps]] (dd4).
  *
  * Both signatures are computed in ONE aggregation pass using 32 (resp.
  * 64) parallel aggregate expressions over the exploded token stream — no
  * per-hash-function re-shuffle, fully map-side partial-aggregated, which
  * is what makes the pattern viable at 100 TB. Hashing uses the codegen'd
  * `xxhash64`, which no external SQL engine reproduces, so these two are
  * oracle-free (driver rows-only check) and their semantics are pinned by
  * DedupSpec: planted near-duplicates are found and the MinHash Jaccard
  * estimate tracks the exact token-set Jaccard of dd4.
  */
object DedupOps extends OpModule {

  private val NumHashes = 32
  // 4 bands of 8: tuned for jaccard ≥ ~0.85. Wide bands matter on
  // corpora with high ambient similarity (shared boilerplate/vocab):
  // narrow bands admit nearly every pair as a candidate and the
  // candidate join degenerates toward all-pairs.
  private val BandSize = 8

  /** (doc_id, sig: array<long>) MinHash signature table — one shuffle.
    *
    * The hash family is two-stage: ONE xxhash64 over the token string,
    * then 32 seeded xxhash64 mixes over that fixed-width 8-byte base
    * (`xxhash64(h, i)`). `xxhash64(tok, i)` would re-consume the full
    * string bytes per seed — 32 string hashes per token row — where the
    * base+mix family does the string work once and each seeded variant is
    * two 8-byte hash rounds (measured ~2× end-to-end on dd2 at sf0.1).
    * Still codegen'd, still free of the ANSI overflow a wrap-around
    * affine family would trip, and independence across seeds comes from
    * the full avalanche of the second hash round.
    *
    * The 32 minima are PACKED into a single array column at the
    * aggregation boundary. Downstream plan width matters more than it
    * looks: every AQE stage boundary re-optimizes the remaining plan on
    * the driver, and with 32 loose columns flowing through
    * cliques→bands→joins that replanning alone cost ~9 s per query at
    * sf0.1 (measured; the identical pipeline on one array column is ~4×
    * faster end to end). On a real cluster that driver stall serializes
    * between stages just the same.
    */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    // 32 seeded mixes inline per (doc, token) row, reduced by 32 `min`
    // aggregates in one map-side-partial pass. (A distinct-vocabulary
    // broadcast-join variant benched slower: the extra exchange costs
    // more than the redundant hashing saves.)
    val minCols: Seq[Column] =
      (0 until NumHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    toks.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Near-dup pairs via MinHash. Two tiers, both linear where the data is
    * degenerate:
    *
    * 1. Signature-identical cliques (common in web-scale corpora: exact
    *    and near-exact duplicates) are collapsed first — each clique
    *    emits (representative, member) pairs, LINEAR in clique size,
    *    where naive bucket pair-expansion would be quadratic (a 1.6k-doc
    *    clique = 1.3M pairs).
    * 2. Banded LSH runs over the distinct-signature representatives only;
    *    bucket pair expansion happens in-expression after a single
    *    shuffle, with a bucket-size cap as the residual skew guard.
    */
  /** @param minBands candidate pairs must collide in at least this many
    *   bands (the distinct becomes a count over the same shuffle). At
    *   high est-thresholds this prunes the signature join's input
    *   several-fold with negligible recall loss (P[≥2 of 4 bands] ≈ 0.89
    *   at j = 0.95).
    */
  /** (sig, ids) — documents grouped by identical full signature, member
    * ids sorted (ids[0] is the clique representative = min id).
    */
  def minhashCliques(s: SparkSession, dir: String): DataFrame =
    minhashSignatures(s, dir)
      .groupBy("sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))

  /** Banded-LSH near-dup pairs between clique REPRESENTATIVES with the
    * minhash-agreement Jaccard estimate.
    */
  private def repPairs(cliques: DataFrame, minEstJaccard: Double, minBands: Int): DataFrame = {
    val reps = cliques.select(element_at(col("ids"), 1).as("doc_id"), col("sig"))
    // xxhash64 hashes array values recursively, so each 8-minhash band
    // slice keys directly; the band index salts the hash so equal slices
    // in different bands land in distinct buckets.
    val bandKeys: Seq[Column] = (0 until NumHashes / BandSize).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * BandSize + 1, BandSize), lit(b)).as("bkey")).as(s"bk$b")
    }
    val buckets = reps
      .withColumn("bk", explode(array(bandKeys: _*)))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .groupBy("band", "bkey")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 1000)) // skew guard
    val cand = buckets
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x AS a, y AS b))))"
      )).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("nbands"))
      .filter(col("nbands") >= minBands)
      .select("a", "b")
    cand
      .join(reps.select(col("doc_id").as("a"), col("sig").as("siga")), "a")
      .join(reps.select(col("doc_id").as("b"), col("sig").as("sigb")), "b")
      .withColumn("est_jaccard",
        expr("aggregate(zip_with(siga, sigb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / NumHashes)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select("a", "b", "est_jaccard")
  }

  /** RETURN CONTRACT — canonicalized pairs, not the full edge list: every
    * emitted pair has a clique REPRESENTATIVE on at least one side. Edges
    * between two non-representative members of different cliques are
    * recoverable transitively (member → its rep via tier 1, rep → other
    * rep via tier 2) but are not enumerated — materializing them would be
    * quadratic in clique size, the exact blow-up tier 1 exists to avoid.
    * Consumers needing per-member edges should join through
    * [[minhashCliques]].
    *
    * The clique table is cached for the duration of the returned plan
    * (it feeds both tiers); the cache lives until the session drops it
    * (`spark.catalog.clearCache()`) — callers embedding this in a longer
    * job should clear it once the pairs are materialized.
    */
  def minhashPairs(s: SparkSession, dir: String, minEstJaccard: Double,
      minBands: Int = 1): DataFrame = {
    val cliques = minhashCliques(s, dir).cache()
    // tier 1: within-clique pairs, est = 1.0 (all minhashes agree)
    val cliquePairs = cliques
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "transform(slice(ids, 2, size(ids) - 1), x -> struct(ids[0] AS a, x AS b))")).as("p"))
      .select(col("p.a"), col("p.b"), lit(1.0).as("est_jaccard"))
    cliquePairs.union(repPairs(cliques, minEstJaccard, minBands)).orderBy("a", "b")
  }

  /** Full dedup-cluster assignment: connected components run over the
    * (tiny) representative graph only; members inherit their rep's
    * component through the clique map. One row per document with the
    * cluster's minimum doc id — the "keep one per cluster" table.
    */
  def dedupClusters(s: SparkSession, dir: String, minEstJaccard: Double): DataFrame = {
    val cliques = minhashCliques(s, dir).cache()
    val rp = repPairs(cliques, minEstJaccard, minBands = 2).select("a", "b")
    // pointer jumping reaches 2^3 hops in 3 fixed rounds — ample for a
    // high-threshold similarity graph (post-collapse components are
    // near-cliques, diameter ~2); skipping the per-round convergence job
    // halves the round cost, and verify=true resumes propagation if the
    // budget ever falls short instead of emitting split clusters
    val comp = graft.ops.GraphOps.connectedComponents(rp, maxIter = 3,
      earlyStop = false, verify = true)
      .withColumnRenamed("id", "rep")
    cliques
      .select(element_at(col("ids"), 1).as("rep"), explode(col("ids")).as("doc_id"))
      .join(comp, Seq("rep"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("rep")).as("cluster_rep"))
      .orderBy("doc_id")
  }

  /** (doc_id, simhash) — 64-bit SimHash from token xxhash64 bits, computed
    * as 64 parallel ±1 sums in one aggregation pass.
    */
  def simhashes(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums: Seq[Column] = (0 until 64).map { i =>
      sum(shiftright(col("h"), i).bitwiseAND(1) * 2 - 1).as(s"s$i")
    }
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val hash: Column = (0 until 64).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), hash.as("simhash"))
  }

  /** Residual skew guard for tier-2 blocking: buckets holding more than
    * this many DISTINCT signatures are dropped (after clique collapse a
    * bucket this dense means >4096 distinct 64-bit sketches sharing one
    * 16-bit block — ambient-density noise, not a dup clique). Exposed so
    * [[simhashDroppedBuckets]] can audit the drop instead of it being
    * silent.
    */
  val SimhashBucketCap = 4096

  /** (simhash, ids) — documents grouped by identical signature, member
    * ids sorted (ids[0] is the clique representative = min id).
    * Identical texts ⇒ identical simhash, so exact-dup cliques collapse
    * here LINEARLY, before any pair expansion — the same tier-1 design as
    * [[minhashCliques]].
    */
  def simhashCliques(s: SparkSession, dir: String): DataFrame =
    simhashes(s, dir)
      .groupBy("simhash")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))

  /** (blk, key, doc_id, simhash) — clique representatives exploded into
    * their four 16-bit pigeonhole block keys.
    */
  private def simhashBlocked(cliques: DataFrame): DataFrame = {
    val reps = cliques.select(element_at(col("ids"), 1).as("doc_id"), col("simhash"))
    val blocks = (0 until 4).map { b =>
      struct(lit(b).as("blk"),
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("key"))
    }
    reps
      .withColumn("bk", explode(array(blocks: _*)))
      .select(col("doc_id"), col("simhash"), col("bk.blk").as("blk"), col("bk.key").as("key"))
  }

  private def simhashBucketSizes(cliques: DataFrame): DataFrame =
    simhashBlocked(cliques).groupBy("blk", "key").agg(count(lit(1)).as("bsz"))

  /** Buckets the tier-2 cap would drop — audit surface for the "no silent
    * caps" posture (DedupSpec asserts this is empty on the corpus; a
    * pipeline at scale should alert on it).
    */
  def simhashDroppedBuckets(s: SparkSession, dir: String): DataFrame =
    simhashBucketSizes(simhashCliques(s, dir))
      .filter(col("bsz") > SimhashBucketCap)
      .select(col("blk"), col("key"), col("bsz").as("n_members"))

  /** SimHash near-dup pairs at unbounded scale, two tiers (mirroring the
    * MinHash design above):
    *
    * 1. Identical-signature cliques collapse to (rep, member) pairs —
    *    LINEAR in clique size, so a 1.6k-doc exact-dup clique emits 1.6k
    *    pairs, not 1.3M, and never reaches the blocked join at all.
    * 2. Pigeonhole blocking over distinct-signature REPRESENTATIVES only:
    *    the 64-bit signature splits into four 16-bit keys; any pair
    *    within hamming ≤ 3 shares at least one block, so candidates come
    *    from an equi-join on (block, key) — never an all-pairs scan.
    *    Larger hamming radii are best-effort recall, as with any blocked
    *    sketch. The hamming filter runs BEFORE the dedup `distinct` —
    *    hamming is functionally determined by (a, b), so the filter is
    *    semantics-preserving and shrinks the dedup shuffle to survivors.
    *
    * RETURN CONTRACT — canonicalized pairs, as in [[minhashPairs]]: every
    * pair has a clique representative on at least one side; member↔other
    * edges are recoverable transitively via [[simhashCliques]], not
    * enumerated. The cached clique table lives until
    * `spark.catalog.clearCache()` — clear it once pairs are materialized.
    */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int): DataFrame = {
    val cliques = simhashCliques(s, dir).cache()
    // tier 1: within-clique pairs, hamming = 0 by construction
    val cliquePairs = cliques
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "transform(slice(ids, 2, size(ids) - 1), x -> struct(ids[0] AS a, x AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), lit(0L).as("hamming"))
    // tier 2: blocked pairs between representatives via a self-equi-join
    // on the block key — rows STREAM through the join (no collect_list
    // bucket rows, so no per-row memory spike however dense a bucket is);
    // the size cap is applied with a semi-join against per-bucket counts.
    val blocked = simhashBlocked(cliques)
    val admitted = blocked.join(
      simhashBucketSizes(cliques).filter(col("bsz").between(2, SimhashBucketCap)),
      Seq("blk", "key"), "left_semi")
    val l = admitted.select(col("blk"), col("key"), col("doc_id").as("a"), col("simhash").as("ha"))
    val r = admitted.select(col("blk"), col("key"), col("doc_id").as("b"), col("simhash").as("hb"))
    val repPairs = l.join(r, Seq("blk", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    cliquePairs.union(repPairs).orderBy("a", "b")
  }

  val qs: Seq[Q] = Seq(
    Q("dd2_minhash_lsh", None, (s, dir) => minhashPairs(s, dir, minEstJaccard = 0.8)),

    Q("dd3b_simhash_lsh", None, (s, dir) => simhashPairs(s, dir, maxHamming = 8)),

    // Dedup clusters: the complete pipeline shape — sketch → clique
    // collapse → rep-graph LSH pairs → connected components on the rep
    // graph only → members inherit labels. One row per document.
    Q("dd6_dedup_clusters", None,
      (s, dir) => dedupClusters(s, dir, minEstJaccard = 0.95)),

    Q("dd3_simhash", None, (s, dir) => {
      val sh = simhashes(s, dir)
      // Near-dup pairs in a bounded block by hamming distance ≤ 16; the
      // signature table itself is the scale artifact.
      val l = sh.filter(col("doc_id") < 200).select(col("doc_id").as("a"), col("simhash").as("ha"))
      val r = sh.filter(col("doc_id") < 200).select(col("doc_id").as("b"), col("simhash").as("hb"))
      l.join(r, col("a") < col("b"))
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= 16)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    })
  )
}
