package graft.tools
import org.apache.spark.sql.SparkSession
/** Round-14 #6 probe: dd2 signature-attachment strategy A/B.
  * For each threshold setting (gate→broadcast vs forced shuffle_hash),
  * run dd2 in a FRESH session: warm-up + 3 timed reps, report min; then
  * assert the verified pair sets are bit-identical.
  * Run: tools/run_tool.sh graft.tools.GateCompare <sfDir>
  */
object GateCompare {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    def leg(thr: String, label: String): Array[String] = {
      val s = SparkSession.builder()
        .master("local[32]")
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.autoBroadcastJoinThreshold", thr)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("graft.scan.fanout", 32)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("dd2_minhash_lsh")(s, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache(); System.gc()
        dt
      }
      val w = run()
      val reps = (1 to 3).map(_ => run())
      val q = graft.SparkEntry.queries("dd2_minhash_lsh")(s, dir)
      val plan = q.queryExecution.executedPlan.toString
      val strat = if (plan.contains("BroadcastHashJoin")) "BHJ"
        else if (plan.contains("ShuffledHashJoin")) "SHJ" else "?"
      println(f"=== $label [$strat] warm $w%.2f reps ${reps.map(r => f"$r%.2f").mkString(" ")} min ${reps.min}%.2f")
      val rows = q.collect().map(_.toString).sorted
      s.stop()
      rows
    }
    val a = leg("10485760", "gate(default thr)")
    val b = leg("-1", "forced shuffle_hash")
    println(s"=== pairs: ${a.length} vs ${b.length}, bit-identical: ${a.sameElements(b)}")
  }
}
