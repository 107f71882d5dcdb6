package graft

import graft.api.EventReader
import graft.etl.EventTables
import org.scalatest.funsuite.AnyFunSuite

class EventReaderSpec extends AnyFunSuite with SparkSuite {

  private lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("reader").toString
    EventTables.spacepoints(spark, nEvents = 6, nPoints = 30)
      .write.mode("overwrite").parquet(s"$dir/events")
    s"$dir/events"
  }

  test("count, index access, and key access agree") {
    val r = new EventReader(spark, path)
    assert(r.nentries == 6)
    val e2 = r.getEntry(2L).get
    assert(e2.getAs[Long]("event") == 2L)
    val byKey = r.getEntry(1L, 0L, 2L).get
    assert(byKey.getAs[Long]("event") == 2L)
    assert(r.getEntry(99L, 0L, 0L).isEmpty)
  }

  test("column projection prunes the schema") {
    val r = new EventReader(spark, path, columns = Some(Seq("run", "subrun", "event")))
    assert(r.df.columns.toSeq == Seq("run", "subrun", "event"))
  }

  test("sampling retries to a row; partition slices cover all entries once") {
    val r = new EventReader(spark, path)
    assert(r.sampleEntry().schema.fieldNames.contains("spacepoint_t"))
    val slices = (0 until 3).map(w => r.partitionSlice(w, 3).count()).sum
    assert(slices == r.nentries)
  }

  test("entry indexing plans contain no global window (single-reducer sort)") {
    val r = new EventReader(spark, path)
    val plan = r.partitionSlice(0, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window in plan:\n$plan")
    // slices partition the deterministic entry order: concatenating the
    // slices in worker order reproduces the sorted key sequence exactly
    val sliceEvents = (0 until 3).flatMap(w =>
      r.partitionSlice(w, 3).collect().map(x =>
        (x.getAs[Long]("run"), x.getAs[Long]("subrun"), x.getAs[Long]("event"))))
    assert(sliceEvents == sliceEvents.sorted)
  }

  test("epoch iteration is deterministic; seeded shuffle permutes") {
    val r = new EventReader(spark, path)
    val plain = r.epoch().map(_.getAs[Long]("event")).toSeq
    assert(plain == plain.sorted)
    val shuf1 = r.epoch(Some(7L)).map(_.getAs[Long]("event")).toSeq
    val shuf2 = r.epoch(Some(7L)).map(_.getAs[Long]("event")).toSeq
    assert(shuf1 == shuf2)
    assert(shuf1.sorted == plain)
  }
}
