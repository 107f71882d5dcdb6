package graft.plans

import org.apache.spark.sql.SparkSession

/** Drives GraftExtensions the way a user would: a session built with
  * `.withExtensions`, SQL calling the injected functions, and the fusion
  * rule rewriting a hand-written HOF dot product.
  * `sbt "runMain graft.plans.ExtensionsDemo"`.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val viaKernel = spark.sql(
      "SELECT vec_id, float_dot(embedding, embedding) AS d, float_norm(embedding) AS n FROM emb ORDER BY vec_id LIMIT 3")
    viaKernel.collect().foreach(r => println(s"[ext] kernel ${r.mkString(", ")}"))
    val viaHof = spark.sql(
      """SELECT vec_id, aggregate(zip_with(embedding, embedding,
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v) AS d
        |FROM emb ORDER BY vec_id LIMIT 3""".stripMargin)
    println(s"[ext] HOF optimized plan mentions floatdot: " +
      viaHof.queryExecution.optimizedPlan.toString.toLowerCase.contains("floatdot"))
    viaHof.collect().foreach(r => println(s"[ext] fused  ${r.mkString(", ")}"))
    val te = spark.sql(
      "SELECT t.idx, t.slice FROM (SELECT array(1.0F, 2.0F, 3.0F, 4.0F) a, array(2L, 2L) s) " +
        "LATERAL VIEW tensor_explode(a, s) t AS idx, slice")
    te.collect().foreach(r => println(s"[ext] tensor ${r.mkString(", ")}"))
    spark.stop()
  }
}
