package graft

import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite with SparkSuite {

  test("streaming hourly aggregate equals the batch window aggregate") {
    // the file stream source requires a directory — stage the single file
    val dir = java.nio.file.Files.createTempDirectory("stream_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.runToCompletion(spark, dir.toString, "st_test")
    val batch = ops.EventOps.qs.find(_.name == "st1_window_agg").get.fn(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stateful flatMapGroupsWithState sessionization equals the batch window form") {
    val dir = java.nio.file.Files.createTempDirectory("stream_sessions")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = graft.streaming.SessionStream
      .runToCompletion(spark, dir.toString, "sess_test")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = ops.WindowOps.qs.find(_.name == "st2_sessionize").get.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }
}
