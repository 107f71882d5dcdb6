package graft.tools

import graft.plans.{GraftExtensions, IntervalJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured demonstration of the custom sorted-interval-join's skew
  * claim (SCALING.md): one hot key with n rows per side, ±w window. The
  * declarative equi-join + residual computes all n² per-key pairs then
  * filters; the custom exec sweeps once. `sbt "runMain
  * graft.tools.SkewIntervalDemo [n]"`.
  */
object SkewIntervalDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new GraftExtensions) // session-setup registration
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one hot key (0), timestamps dense so windows stay small
    val l = spark.range(n).select(lit(0L).as("k"), (col("id") * 3).as("t"))
    val r = spark.range(n).select(lit(0L).as("k2"), (col("id") * 3 + 1).as("t2"))
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"$label%-12s rows=$c%d  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      c
    }
    val c1 = time("custom") {
      IntervalJoin.join(l, r, "k", "k2", "t", "t2", 0L, 10L)
    }
    val c2 = time("declarative") {
      l.join(r, l("k") === r("k2") && r("t2") >= l("t") && r("t2") <= l("t") + 10)
    }
    assert(c1 == c2, s"result mismatch: $c1 vs $c2")
    spark.stop()
  }
}
