package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sampling / shuffling (SURVEY.md §2.7 R1–R2, R5).
  *
  * All three use HASH-DERIVED randomness (md5 of the row key + a seed
  * string) instead of Spark's partition-level RNG streams. That choice is
  * what a production 100 TB pipeline wants anyway: the sample for a given
  * row is a pure function of its key, so it is stable under repartitioning,
  * task retries, cluster resizing, and AQE replans — and reproducible by
  * any engine with md5, which is what lets DuckDB oracle these exactly.
  *
  * The uniform draw is the first 8 hex chars of the md5; comparing that
  * fixed-width lowercase hex string lexicographically against the hex
  * encoding of floor(fraction * 2^32) IS the numeric comparison, with no
  * engine-specific hex parsing involved.
  */
object SamplingOps extends OpModule {

  /** First 32 bits of md5(key|seed) as fixed-width lowercase hex. */
  private def u32hex(seed: String, keys: Column*): Column =
    substring(md5(concat_ws("|", keys :+ lit(seed): _*)), 1, 8)

  private def sqlU32hex(seed: String, keys: String*): String =
    s"substr(md5(concat_ws('|', ${keys.mkString(", ")}, '$seed')), 1, 8)"

  /** Hex threshold for a Bernoulli keep-fraction: floor(f * 2^32),
    * clamped to 0xffffffff — without the clamp, fraction = 1.0 prints
    * the 9-char "100000000", which sorts BELOW most 8-char hashes
    * lexicographically and would silently invert keep-everything into
    * keep-~1/16th. (The clamp drops the single hash "ffffffff", a
    * 2⁻³² bias, on both engines identically.)
    */
  private def thresh(fraction: Double): String =
    f"${math.min((fraction * 4294967296d).toLong, 0xFFFFFFFFL)}%08x"

  val qs: Seq[Q] = Seq(
    // R1 — Bernoulli sample (df.sample(False, frac), larmatch_dataset.py:148-157),
    // re-expressed as key-hash thresholding.
    Q("r1_bernoulli_sample", Some(
      s"""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         |WHERE ${sqlU32hex("r1/42", "l_orderkey", "l_linenumber")} < '${thresh(0.05)}'
         |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(u32hex("r1/42", col("l_orderkey"), col("l_linenumber")) < lit(thresh(0.05)))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // R2 — seeded random permutation (epoch shuffle, larvoxel_dataset.py:66-69):
    // a total order by key hash is a reproducible shuffle, and the prefix
    // is served by TakeOrderedAndProject (no global sort materialized).
    Q("r2_shuffle_epoch", Some(
      s"""SELECT l_orderkey, l_linenumber FROM lineitem
         |ORDER BY ${sqlU32hex("epoch/42", "l_orderkey", "l_linenumber")},
         |         l_orderkey, l_linenumber
         |LIMIT 100""".stripMargin),
      (s, dir) => Tables(s, dir, "lineitem")
        .orderBy(u32hex("epoch/42", col("l_orderkey"), col("l_linenumber")),
          col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber")
        .limit(100)),

    // R5 — stratified sampling (kploader.sample_data with truth strata,
    // root2parquet.py:58-60): per-stratum Bernoulli fractions.
    Q("r5_stratified_sample", Some(
      s"""SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
         |WHERE ${sqlU32hex("r5/42", "l_orderkey", "l_linenumber")} <
         |  CASE l_returnflag WHEN 'A' THEN '${thresh(0.02)}'
         |                    WHEN 'N' THEN '${thresh(0.05)}'
         |                    WHEN 'R' THEN '${thresh(0.1)}' ELSE '00000000' END
         |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => Tables(s, dir, "lineitem")
        .filter(u32hex("r5/42", col("l_orderkey"), col("l_linenumber")) <
          when(col("l_returnflag") === "A", thresh(0.02))
            .when(col("l_returnflag") === "N", thresh(0.05))
            .when(col("l_returnflag") === "R", thresh(0.1))
            .otherwise("00000000"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"))
  ,

    // r6 — FIXED-SIZE per-stratum sample (eval-set construction: exactly
    // k docs per language, not a fraction): rank every doc within its
    // language by the seeded hash — a deterministic uniform order — and
    // keep the first k. Unlike r5's Bernoulli thresholding the output
    // size is exact, retry-stable, and oracle-reproducible. The
    // per-language rank window is exact like x17's (one partition per
    // language); for k ≪ group size at 100 TB the scale path is a
    // mergeable bounded-heap Aggregator (k smallest hashes per group —
    // x16's merge-tree shape), same answer without the full sort.
    Q("r6_fixed_stratified", Some(
      s"""SELECT lang, doc_id FROM (
         |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY ${sqlU32hex("r6/11", "doc_id")}, doc_id) AS rn
         |  FROM documents) WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(u32hex("r6/11", col("doc_id")), col("doc_id"))
        Tables(s, dir, "documents").select("lang", "doc_id")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select("lang", "doc_id")
          .orderBy("lang", "doc_id")
      }),

    // r7 — WEIGHTED Bernoulli sampling: each row keeps with probability
    // proportional to its weight (importance sampling by quantity —
    // the "sample big documents more" shape of data-mixture tuning).
    // keep ⇔ u < f·2³²·(qty / max_qty), tested CROSS-MULTIPLIED in
    // BIGINTs — u·max_qty < floor(f·2³²)·qty — so the draw is exact
    // integer arithmetic on both engines (no float probabilities), and
    // hash-keyed like r1: stable under repartition, retry, resize.
    // One broadcast max + a map-side predicate; no data shuffle before
    // the presentation sort.
    Q("r7_weighted_sample", Some(
      s"""WITH m AS (SELECT CAST(max(l_quantity) AS BIGINT) AS mq FROM lineitem),
         |u AS (SELECT l_orderkey, l_linenumber, l_quantity,
         |        ${graft.U32Fold.sql} AS u
         |      FROM (SELECT l_orderkey, l_linenumber, l_quantity,
         |              ${sqlU32hex("r7/42", "l_orderkey", "l_linenumber")} AS h
         |            FROM lineitem))
         |SELECT l_orderkey, l_linenumber, l_quantity FROM u, m
         |WHERE u * mq < 858993459 * CAST(l_quantity AS BIGINT)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.crossJoin(broadcast(
            li.agg(max("l_quantity").cast("long").as("mq"))))
          .withColumn("h", u32hex("r7/42", col("l_orderkey"), col("l_linenumber")))
          // codegen conv, not the interpreted HOF fold — see U32Fold
          // (the fold read 5.5 s at sf0.1 on this single-task scan,
          // conv ~1 s; DuckDB keeps the fold SQL)
          .withColumn("u", expr(graft.U32Fold.convExpr))
          .filter(col("u") * col("mq") < lit(858993459L) * col("l_quantity").cast("long"))
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
      })
  )
}
