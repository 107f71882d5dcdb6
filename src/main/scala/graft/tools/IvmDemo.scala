package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.etl.IvmOps
import graft.plans.MvRegistry

/** Measured decomposition of the IVM economics (SCALING.md): the ivm
  * QUERIES time store-build + refresh together (one self-contained
  * oracled unit); this demo separates the three costs that matter at
  * scale —
  *
  *   1. full recompute (the life without IVM: aggregate the whole fact),
  *   2. refresh only (store exists: aggregate the delta + merge),
  *   3. view read via MvRewriteRule (the query side: scan partials).
  *
  * `sbt "runMain graft.tools.IvmDemo [sfDir] [reps]"`.
  */
object IvmDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("graft.scan.fanout", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val D = DecimalType(18, 4)

    def orders = graft.Tables(spark, dir, "orders")
    def withCut = orders.crossJoin(
      broadcast(orders.agg(expr("(max(o_orderkey) + 1) div 2").as("cut"))))
    def base = withCut.filter(col("o_orderkey") < col("cut"))
    def delta = withCut.filter(col("o_orderkey") >= col("cut"))

    def time(label: String)(df: => DataFrame): Double = {
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-24s $t%.2f s (min of $reps)")
      t
    }

    // a production-shaped 1% delta beside the oracled queries' 50% one
    // (the 50% split exists to exercise the merge, not to model a crawl)
    def withCut99 = orders.crossJoin(
      broadcast(orders.agg(expr("((max(o_orderkey) + 1) * 99) div 100").as("cut"))))
    def base99 = withCut99.filter(col("o_orderkey") < col("cut"))
    def delta99 = withCut99.filter(col("o_orderkey") >= col("cut"))

    // stage the store once (the amortized one-time cost, timed separately)
    val storeDir = java.nio.file.Files.createTempDirectory("ivm_demo").toString
    val t0 = System.nanoTime()
    IvmOps.orderPartials(base).write.mode("overwrite").parquet(s"$storeDir/base")
    IvmOps.orderPartials(base99).write.mode("overwrite").parquet(s"$storeDir/base99")
    IvmOps.orderPartials(orders).write.mode("overwrite").parquet(s"$storeDir/full")
    println(f"store builds (one-time)  ${(System.nanoTime() - t0) / 1e9}%.2f s")

    time("full recompute") {
      orders.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).as("sum_dec"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
    }
    time("refresh only (50% delta)") {
      IvmOps.refreshInsertOnly(spark.read.parquet(s"$storeDir/base"), delta)
    }
    time("refresh only (1% delta)") {
      IvmOps.refreshInsertOnly(spark.read.parquet(s"$storeDir/base99"), delta99)
    }
    // the production refresh: the changelog ARRIVES as its own small
    // input (a crawl drop, a stream micro-batch — IvmStream's shape);
    // deriving it by filtering the full fact above re-scans the fact
    // because a runtime-scalar cut cannot push down to the scan
    delta99.select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$storeDir/delta99")
    time("refresh (staged 1% delta)") {
      IvmOps.refreshInsertOnly(spark.read.parquet(s"$storeDir/base99"),
        spark.read.parquet(s"$storeDir/delta99"))
    }
    MvRegistry.register(spark, s"$dir/orders.parquet", s"$storeDir/full")
    try time("view read (mv rewrite)") {
      orders.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D)).as("sum_dec"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
    } finally MvRegistry.unregister(s"$dir/orders.parquet")
    spark.stop()
  }
}
