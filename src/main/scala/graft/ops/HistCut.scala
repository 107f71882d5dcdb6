package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The histogram-cut quantile machinery shared by ev4b and w3b (and the
  * pattern x17b pioneered): values bin by INTEGER arithmetic over
  * broadcast (lo, hi) bounds, the per-bin counts (≤ `bins` rows at any
  * corpus size) carry all rank information, and cumulative counts over
  * the tiny histogram assign each bin its quartile — no window ever
  * touches data cardinality. ONE implementation each for the Spark and
  * DuckDB-oracle sides on purpose: the bin rule and the n/4.0 edge
  * comparisons must stay bit-identical across engines and across call
  * sites, and drift between scattered copies would silently break
  * oracle parity (the U32Fold precedent).
  */
object HistCut {

  final val Bins = 1024

  /** `((v − lo) · Bins) div (hi − lo + 1)` ∈ [0, Bins) — all BIGINT,
    * non-negative numerator by construction (lo = min), so Spark `div`
    * and DuckDB `//` agree exactly. Spelled once for both engines.
    *
    * The numerator is guarded: `(v − lo) · Bins` wraps silently past
    * Long.MaxValue in non-ANSI Spark while DuckDB would error, so a
    * value range wider than Long.MaxValue/Bins (≈9e15 — e.g. a 10^4-
    * scaled decimal sum at extreme per-key magnitudes) would diverge
    * exactly where the oracle cannot run. Like the v7/instanceTableCC
    * packing guards, the query THROWS instead of binning garbage; the
    * branch is codegen'd and costs one comparison per row.
    */
  def binExpr(v: String, lo: String, hi: String): String =
    s"""(CASE WHEN ($v - $lo) > ${Long.MaxValue / Bins}
       |  THEN CAST(raise_error('HistCut bin overflow: value range exceeds Long.MaxValue/$Bins') AS BIGINT)
       |  ELSE ($v - $lo) * $Bins END) div ($hi - $lo + 1)""".stripMargin
  def binSql(v: String, lo: String, hi: String): String =
    s"(($v - $lo) * $Bins) // ($hi - $lo + 1)"

  private def quartileCol(cumPrev: Column, n: Column): Column =
    when(cumPrev < n / 4.0, 1)
      .when(cumPrev < n / 2.0, 2)
      .when(cumPrev < n * 3.0 / 4.0, 3)
      .otherwise(4).cast("long")

  /** Per-bin quartile table for `binCol` of `binned`: cumulate in the
    * cut direction (asc = smallest value → quartile 1), compare the
    * strictly-ahead count against the n/4 edges. Output (binCol, out),
    * ≤ [[Bins]] rows — always broadcast it back onto the data.
    */
  def quartileCuts(binned: DataFrame, binCol: String, asc: Boolean,
      out: String): DataFrame = {
    val one = Window.partitionBy(lit(1))
    val cum = one.orderBy(if (asc) col("bin").asc else col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    binned.groupBy(col(binCol).as("bin")).agg(count(lit(1)).as("c"))
      .withColumn("cum_prev", coalesce(sum("c").over(cum), lit(0L)))
      .withColumn("n", sum("c").over(one))
      .select(col("bin").as(binCol),
        quartileCol(col("cum_prev"), col("n")).as(out))
  }

  /** DuckDB twin of [[quartileCuts]]: a subquery emitting (bin, q) from
    * source relation `src`, cumulating `binCol`'s histogram in `order`
    * (ASC/DESC) — embed as a CTE body.
    */
  def quartileCutSql(src: String, binCol: String, order: String): String =
    s"""SELECT bin, CASE WHEN cum_prev < n / 4.0 THEN 1
       |            WHEN cum_prev < n / 2.0 THEN 2
       |            WHEN cum_prev < n * 3.0 / 4.0 THEN 3 ELSE 4 END AS q
       |FROM (SELECT bin,
       |        coalesce(sum(c) OVER (ORDER BY bin $order
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev,
       |        sum(c) OVER () AS n
       |      FROM (SELECT $binCol AS bin, count(*) AS c FROM $src GROUP BY 1))""".stripMargin
}
