package graft.tools

import graft.ops.SkewJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured demonstration of j10's salting claim (COVERAGE.md): the
  * planted-hot-key join (70% of lineitem on one key, 997-row derived
  * dim, shuffle_hash on both variants so broadcast never rescues the
  * plan) run UNSALTED — the hot key's entire probe side lands in one
  * reducer task — vs salted across 32 sub-keys. Timings are full-plan
  * noop writes, min of `reps`. `sbt "runMain graft.tools.SkewSaltDemo
  * [sfDir] [reps]"`.
  */
object SkewSaltDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("graft.scan.fanout", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def big = graft.Tables(spark, dir, "lineitem").select(
      when(col("l_orderkey") % 10 < 7, lit(0L))
        .otherwise(col("l_orderkey") % 997).as("hk"),
      col("l_extendedprice"))
    def dim = graft.Tables(spark, dir, "part")
      .groupBy((col("p_partkey") % 997).as("k"))
      .agg(count(lit(1)).as("dim_n"))
    def agg(j: org.apache.spark.sql.DataFrame) = j.groupBy("hk")
      .agg(count(lit(1)).as("n"), sum("dim_n").as("dim_total"),
        graft.Dec.dsum(col("l_extendedprice")).as("price_sum"))
      .orderBy("hk")
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-10s $t%.2f s (min of $reps)")
      t
    }
    time("unsalted") {
      agg(big.join(dim.hint("shuffle_hash"), col("hk") === col("k")))
    }
    time("salted") {
      agg(SkewJoin.saltedJoin(big, dim.hint("shuffle_hash"),
        col("hk"), col("k"), salts = 32))
    }
    spark.stop()
  }
}
