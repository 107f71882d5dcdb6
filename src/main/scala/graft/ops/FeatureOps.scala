package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** ML feature engineering over relational inputs — the two encodings a
  * training-data pipeline applies to categorical columns before a model
  * sees them: the hashing trick (bounded feature space, no vocabulary
  * state) and leave-one-out target encoding (label statistics without
  * self-leakage). Both deterministic and fully DuckDB-oracled.
  */
object FeatureOps extends OpModule {

  private val HashDim = 64

  private def foldU = graft.U32Fold.convExpr
  private def foldUSql = graft.U32Fold.sql

  val qs: Seq[Q] = Seq(
    // ft1 — the HASHING TRICK (Weinberger et al.): project categorical
    // features into a fixed 64-bucket space via a hash, with a second
    // hash bit choosing ±1 so collisions cancel in expectation — the
    // encoding that needs NO vocabulary table, no fit step, and no
    // state at any corpus size (new category values just hash). Wholly
    // map-side until the per-(row, bucket) sum; emitted sparse as
    // (order, bucket, weight) rows. The md5-prefix fold makes the
    // bucket/sign arithmetic engine-exact.
    Q("ft1_feature_hash", Some(
      s"""WITH f AS (SELECT o_orderkey, unnest(['status=' || o_orderstatus,
         |                    'priority=' || o_orderpriority]) AS feat
         |           FROM orders),
         |u AS (SELECT o_orderkey, $foldUSql AS u
         |      FROM (SELECT o_orderkey, substr(md5(feat), 1, 8) AS h FROM f))
         |SELECT o_orderkey, u % $HashDim AS bucket,
         |  CAST(sum(CASE WHEN (u // $HashDim) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS w
         |FROM u GROUP BY 1, 2 ORDER BY o_orderkey, bucket""".stripMargin),
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"), explode(array(
          concat(lit("status="), col("o_orderstatus")),
          concat(lit("priority="), col("o_orderpriority")))).as("feat"))
        .withColumn("h", substring(md5(col("feat")), 1, 8))
        .withColumn("u", expr(foldU))
        .groupBy(col("o_orderkey"), (col("u") % HashDim).as("bucket"))
        .agg(sum(when(expr(s"(u div $HashDim) % 2") === 0, 1).otherwise(-1))
          .cast("long").as("w"))
        .orderBy("o_orderkey", "bucket")),

    // ft2 — LEAVE-ONE-OUT target encoding: each order's priority is
    // replaced by the mean total price of all OTHER orders sharing that
    // priority — excluding the row's own label is what prevents target
    // leakage into training features. Category sums accumulate in
    // DECIMAL(38,4) (2-decimal money sits exactly on the scale-4 grid,
    // so both engines recover the true sums); the per-row
    // (sum − own) / (n − 1) is one subtraction and one division —
    // single correctly-rounded IEEE ops on agreed inputs, so the result
    // is bit-identical UNROUNDED (round(x, 9) would itself diverge here:
    // singleton categories encode NULL — guarded on BOTH sides because
    // ANSI-mode Spark throws DIVIDE_BY_ZERO where DuckDB returns NULL;
    // at ~2.6e5 magnitude, 9 decimals exceeds double precision and the
    // engines' round implementations disagree in the last ulp — measured).
    // One tiny category aggregate broadcast
    // back over the fact — the fact table never shuffles.
    Q("ft2_target_encode", Some(
      """WITH c AS (SELECT o_orderpriority,
        |             CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sc,
        |             CAST(count(*) AS DOUBLE) AS nc
        |           FROM orders GROUP BY 1)
        |SELECT o_orderkey, o.o_orderpriority,
        |  CASE WHEN nc > 1 THEN (sc - o_totalprice) / (nc - 1) END AS te_loo
        |FROM orders o JOIN c ON c.o_orderpriority = o.o_orderpriority
        |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val orders = Tables(s, dir, "orders")
        val cat = orders.groupBy("o_orderpriority")
          .agg(sum(col("o_totalprice").cast(DecimalType(38, 4))).cast("double").as("sc"),
            count(lit(1)).cast("double").as("nc"))
        orders.join(broadcast(cat), "o_orderpriority")
          .select(col("o_orderkey"), col("o_orderpriority"),
            when(col("nc") > 1,
              (col("sc") - col("o_totalprice")) / (col("nc") - 1)).as("te_loo"))
          .orderBy("o_orderkey")
      })
  )
}
