package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.functions._

/** Sampling / shuffling (SURVEY.md §2.7 R1–R2). Sampling output depends on
  * Spark's partition-level RNG streams, which no external oracle can
  * reproduce, so these are declared without oracle SQL (driver records a
  * rows-only check; contract allows it) and their statistical properties
  * are asserted in SamplingSpec.
  */
object SamplingOps extends OpModule {

  val qs: Seq[Q] = Seq(
    // R1 — Bernoulli sample (df.sample(False, frac), larmatch_dataset.py:148-157).
    Q("r1_bernoulli_sample", None,
      (s, dir) => Tables(s, dir, "lineitem")
        .sample(withReplacement = false, fraction = 0.05, seed = 42L)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // R2 — seeded random permutation (epoch shuffle, larvoxel_dataset.py:66-69).
    Q("r2_shuffle_epoch", None,
      (s, dir) => Tables(s, dir, "lineitem")
        .orderBy(rand(42L), col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber")
        .limit(100)),

    // R5 — stratified sampling (kploader.sample_data with truth strata,
    // root2parquet.py:58-60): per-stratum Bernoulli fractions.
    Q("r5_stratified_sample", None,
      (s, dir) => Tables(s, dir, "lineitem")
        .stat.sampleBy("l_returnflag",
          Map("A" -> 0.02, "N" -> 0.05, "R" -> 0.1), seed = 42L)
        .select("l_orderkey", "l_linenumber", "l_returnflag"))
  )
}
