package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout: multi-dimensional row-group
  * clustering for the case a single-column sort cannot serve — a table
  * probed by range predicates on TWO independent keys. Sorting by key A
  * makes every row group's A-range tight but leaves its B-range spanning
  * the whole table (B prunes nothing); interleaving the bits of both
  * keys and range-clustering on the interleaved value gives every file
  * and row group a bounded rectangle in (A, B) space, so min/max
  * statistics prune on EITHER dimension.
  *
  * All arithmetic is Column expressions (codegen, no UDF): each key is
  * linearly ranked into 16 bits against its broadcast min/max, then
  * spread with the classic mask sequence and interleaved into a 32-bit
  * Morton code. Scale shape: one tiny stats aggregate + one range
  * exchange on the z-value — exactly what a single-column sorted write
  * costs. The linear ranking assumes roughly uniform keys (true for
  * synthetic ids); heavily skewed keys would want a quantile-based rank
  * (range_partition_id) instead.
  *
  * The reference's analog is its (row, col) plane-indexed image matrices
  * (`view_spacepoint_data.ipynb` cell-11..13) — 2-D locality served
  * there by dense arrays, here by layout.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (Morton). */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** 16-bit linear rank of `v` in [vmin, vmax] (0 when degenerate). */
  private def rank16(v: Column, vmin: Column, vmax: Column): Column =
    when(vmax <= vmin, lit(0L)).otherwise(
      ((v.cast("double") - vmin) / (vmax - vmin) * 65535.0).cast("long"))

  /** 32-bit Morton code of two ranked columns. */
  def zValue(a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column): Column =
    spread16(rank16(a, aMin, aMax))
      .bitwiseOR(shiftleft(spread16(rank16(b, bMin, bMax)), 1))

  /** Write `df` z-ordered on (`ca`, `cb`): rank both keys against their
    * global min/max (one broadcast stats row), range-partition by the
    * Morton code into `numFiles` files, sort within each, drop the
    * helper column. Every file and row group then covers a bounded
    * rectangle of (ca, cb) space.
    */
  def zorderWrite(df: DataFrame, ca: String, cb: String, path: String,
      numFiles: Int, rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    val stats = df.agg(
      min(ca).cast("double").as("__amin"), max(ca).cast("double").as("__amax"),
      min(cb).cast("double").as("__bmin"), max(cb).cast("double").as("__bmax"))
    val zed = df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(col(ca), col("__amin"), col("__amax"),
        col(cb), col("__bmin"), col("__bmax")))
      .drop("__amin", "__amax", "__bmin", "__bmax")
    writeByZ(zed, path, numFiles, rowGroupBytes)
  }

  /** The SKEW-ROBUST variant: rank each key by its QUANTILE (256
    * `approxQuantile` cut points, broadcast as a literal array and
    * binary-search-free counted with one `filter` HOF) instead of the
    * linear min/max rank. On a heavy-tailed key the linear rank maps
    * most rows to one rank cell — every file then overlaps the dense
    * region and a probe there prunes nothing — while quantile ranks
    * spread the data evenly by construction. Cost: one approxQuantile
    * pass (sketch-based, driver holds 2×256 doubles) instead of the
    * min/max aggregate; the write path is identical.
    */
  def zorderWriteQuantile(df: DataFrame, ca: String, cb: String, path: String,
      numFiles: Int, rowGroupBytes: Long = 128L * 1024 * 1024,
      buckets: Int = 256): Unit =
    writeByZ(df.withColumn("__z", quantileZColumn(df, ca, cb, buckets)),
      path, numFiles, rowGroupBytes)

  /** The quantile-ranked Morton code as a reusable Column (one
    * approxQuantile pass over `df`, cuts embedded as literals): 8-bit
    * quantile ranks spread to alternating bits — coarser cells than the
    * 16-bit linear rank, but cell POPULATIONS are uniform, which is the
    * property pruning needs on skewed keys. Shared by the flat
    * [[zorderWriteQuantile]] writer and the partitioned composed layout
    * (LayoutOps.partitionedZorderLayout), so both cluster identically.
    */
  def quantileZColumn(df: DataFrame, ca: String, cb: String,
      buckets: Int = 256): Column = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val Array(cutsA, cutsB) =
      df.stat.approxQuantile(Array(ca, cb), probs, 0.001)
    def qrank(v: Column, cuts: Array[Double]): Column =
      size(filter(array(cuts.map(lit(_)): _*), c => v.cast("double") >= c))
        .cast("long")
    spread16(qrank(col(ca), cutsA))
      .bitwiseOR(shiftleft(spread16(qrank(col(cb), cutsB)), 1))
  }

  private def writeByZ(zed: DataFrame, path: String, numFiles: Int,
      rowGroupBytes: Long): Unit =
    zed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)

  /** Measured pruning evidence (PLANS.md + ZOrderSpec): write lineitem
    * once sorted by l_partkey alone and once z-ordered on
    * (l_partkey, l_suppkey), probe each with the same narrow range on
    * EACH dimension, and return scan-emitted row counts
    * ((sortedA, sortedB), (zA, zB)). The single-sort layout prunes only
    * its own column (B-range reads ~everything); the z-layout prunes
    * both.
    */
  def zorderPruneStats(s: SparkSession, dir: String)
      : ((Long, Long), (Long, Long)) = {
    val base = ScratchDirs.keyed("zorder_demo", dir)
    val li = graft.Tables(s, dir, "lineitem")
    SinkOps.sortedWrite(li, "l_partkey", s"$base/sorted_a", rowGroupBytes = 32 * 1024)
    zorderWrite(li, "l_partkey", "l_suppkey", s"$base/zorder",
      numFiles = 4, rowGroupBytes = 32 * 1024)
    val (aLo, aHi, bLo, bHi) = {
      val r = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // ~1/16th of each key range: narrow enough to prune, wide enough to
    // span several row groups
    def probe(path: String, c: String, lo: Long, hi: Long): Long = {
      val w = math.max(1L, (hi - lo) / 16)
      val q = s.read.parquet(path).filter(col(c).between(lo, lo + w))
      q.collect()
      graft.plans.PlanScans.fileScans(q.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
    }
    ((probe(s"$base/sorted_a", "l_partkey", aLo, aHi),
      probe(s"$base/sorted_a", "l_suppkey", bLo, bHi)),
      (probe(s"$base/zorder", "l_partkey", aLo, aHi),
        probe(s"$base/zorder", "l_suppkey", bLo, bHi)))
  }
}
