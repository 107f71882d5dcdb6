package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `format("root")` facade (SURVEY §2.1 S1–S4): API-shape parity with the
  * reference's event-store opening — product selection, manifest file
  * lists, schema merge — with pruning/pushdown crossing the facade.
  */
class RootSourceSpec extends AnyFunSuite with SparkSuite {

  private def stage(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rootstage").toString
    Seq((1L, 0L, 10L, "mu", 3.5), (1L, 0L, 11L, "e", 1.2), (2L, 1L, 12L, "p", 9.9))
      .toDF("run", "subrun", "event", "mcreco", "adc")
      .write.parquet(s"$dir/f1")
    Seq((3L, 1L, 13L, "pi", 0.4))
      .toDF("run", "subrun", "event", "mcreco", "adc")
      .write.parquet(s"$dir/f2")
    dir
  }

  test("S1/S4: format(\"root\") resolves by short name and chains multiple files") {
    val dir = stage()
    // true varargs chaining — the TChain shape (V2 TableProvider receives
    // every path; the old V1 RelationProvider only ever saw one) …
    val varargs = spark.read.format("root").load(s"$dir/f1", s"$dir/f2")
    assert(varargs.count() == 4)
    // … comma-list chaining (kept for compatibility) …
    val df = spark.read.format("root").load(s"$dir/f1,$dir/f2")
    assert(df.count() == 4)
    assert(df.columns.sorted.toSeq == Seq("adc", "event", "mcreco", "run", "subrun"))
    // … and Hadoop-glob chaining
    val globbed = spark.read.format("root").load(s"$dir/{f1,f2}")
    assert(globbed.count() == 4)
  }

  test("S1/S2: products option selects columns like set_data_to_read; missing product errors") {
    val dir = stage()
    val df = spark.read.format("root")
      .option("products", "run,event,mcreco").load(s"$dir/f1")
    assert(df.columns.toSeq == Seq("run", "event", "mcreco"))
    val err = intercept[IllegalArgumentException] {
      spark.read.format("root").option("products", "nosuchtree").load(s"$dir/f1").schema
    }
    assert(err.getMessage.contains("nosuchtree"))
  }

  test("S5: .txt manifest resolves to its listed files, comments skipped") {
    val dir = stage()
    val manifest = s"$dir/files.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(manifest),
      s"# staged event files\n$dir/f1\n\n$dir/f2\n")
    val df = spark.read.format("root").load(manifest)
    assert(df.count() == 4)
  }

  test("S7: mergeSchema unions drifted schemas across files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rootmerge").toString
    Seq((1L, "x")).toDF("event", "mcreco").write.parquet(s"$dir/old")
    Seq((2L, 4.2)).toDF("event", "opflash").write.parquet(s"$dir/new")
    val df = spark.read.format("root").load(s"$dir/old,$dir/new")
    assert(df.columns.sorted.toSeq == Seq("event", "mcreco", "opflash"))
    assert(df.count() == 2)
  }

  test("pruning and pushdown cross the facade") {
    val dir = stage()
    val q = spark.read.format("root").load(s"$dir/f1,$dir/f2")
      .filter(col("adc") > 2.0).select("run", "mcreco")
    // V2 scan: the predicate reaches the parquet reader's PushedFilters
    // and the ReadSchema carries only the required columns (no subrun) …
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(adc"), scan)
    assert(!scan.contains("subrun"), scan)
    // … and results stay correct.
    assert(q.collect().map(_.getString(1)).sorted.toSeq == Seq("mu", "p"))
  }

  test("tickBackward accepted for API parity (no-op on staged parquet)") {
    val dir = stage()
    val df = spark.read.format("root").option("tickBackward", "true").load(s"$dir/f1")
    assert(df.count() == 3)
  }

  test("tickBackward honesty on a reversed-rows fixture: no silent reorder, sort recovers") {
    // A fixture staged in reverse tick order (the shape real kTickBackward
    // data would arrive in). The facade documents tickBackward as a
    // read-order no-op on staged parquet — this pins that the option does
    // NOT silently permute or drop rows (same multiset either way), and
    // that the consumer-side recovery (ORDER BY tick — row order is never
    // a Spark contract; ordering is declarative) yields tick-forward.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rootrev").toString
    Seq((2400L, 30.0), (2399L, 20.0), (2398L, 10.0))
      .toDF("tick", "adc").coalesce(1).write.parquet(s"$dir/rev")
    val on = spark.read.format("root").option("tickBackward", "true").load(s"$dir/rev")
    val off = spark.read.format("root").load(s"$dir/rev")
    assert(on.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq ==
      off.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq)
    assert(on.orderBy(col("tick")).select("tick").as[Long].collect().toSeq ==
      Seq(2398L, 2399L, 2400L))
  }
}
