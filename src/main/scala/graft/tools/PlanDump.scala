package graft.tools

/** Round-15 plan-evidence dumper: writes `explain("formatted")` output
  * for the named queries to `<outDir>/<query>_<tag>.txt` — the
  * before/after artifacts backing OPTIMIZATION_r15.md's plan claims.
  *
  * Usage: `runMain graft.tools.PlanDump <tag> <outDir> <q1,q2,...> [sfDir]`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = args(1)
    val names = args(2).split(",").filter(_.nonEmpty)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the bench session's fan-out, so the dumped plans are the plans
      // the bench actually times (the gate's effect must be visible)
      .config("graft.scan.fanout", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt")
      try w.println(formatted) finally w.close()
      println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
