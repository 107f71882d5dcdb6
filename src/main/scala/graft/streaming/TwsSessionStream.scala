package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Event-time sessionization on Spark 4's `transformWithState`
  * (SPARK-42931) — the arbitrary-state API Spark is converging on:
  * named TYPED state slots (`ValueState`), explicit event-time TIMERS
  * (any number, registered per key) instead of `GroupState`'s single
  * implicit timeout, and per-state TTL. The API requires the RocksDB
  * state-store provider (its multi-state layout needs column families
  * the default HDFS-backed provider lacks) — the same production
  * backend StreamingSpec's RocksDB test pins, so the two features are
  * exercised together.
  *
  * Semantics are IDENTICAL to [[SessionStream.sessionizeEventTime]]:
  * a user's open-session event times buffer in state, and a
  * gap-separated run emits exactly once — when the watermark proves
  * `last + gap` has passed, so no future arrival can join it. The spec
  * runs both implementations over the same time-reversed cross-batch
  * replay and asserts equal session sets.
  */
object TwsSessionStream {
  import SessionStream.{ClosedSession, EvT, GapUs}

  /** State payload: the open-session event times of one user (µs). A
    * case class wrapper because the state encoder is product-based.
    */
  case class OpenBuf(times: Array[Long])

  class SessionProcessor extends StatefulProcessor[Long, EvT, ClosedSession] {
    @transient private var buf: ValueState[OpenBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[OpenBuf]("open_session_times",
        Encoders.product[OpenBuf], TTLConfig.NONE)

    /** Split sorted times into gap-runs, close the watermark-proven
      * ones, update state, and arm a timer for the open tail (so quiet
      * users still flush when the watermark passes them). Shared by the
      * input and timer handlers — the close rule must not depend on WHY
      * we woke up.
      */
    private def sweep(key: Long, incoming: Seq[Long],
        wmUs: Long): Iterator[ClosedSession] = {
      val prior = if (buf.exists()) buf.get().times.toSeq else Seq.empty[Long]
      val sorted = (prior ++ incoming).sorted
      val sessions = scala.collection.mutable.ListBuffer[Vector[Long]]()
      var cur = Vector.empty[Long]
      sorted.foreach { t =>
        if (cur.nonEmpty && t - cur.last > GapUs) { sessions += cur; cur = Vector.empty }
        cur = cur :+ t
      }
      if (cur.nonEmpty) sessions += cur
      val (closed, open) = sessions.partition(s => s.last + GapUs < wmUs)
      val remaining = open.flatten
      if (remaining.isEmpty) buf.clear()
      else {
        buf.update(OpenBuf(remaining.toArray))
        // wake when the watermark passes the EARLIEST open run's close
        // point (min over runs of last+gap, +1 ms so an exact-boundary
        // fire still satisfies the strict `<`) — arming at the tail's
        // close point would delay an already-closable earlier run until
        // the tail expires; that run's next sweep re-arms for the next
        // one, and a stale duplicate timer just triggers an empty sweep
        getHandle.registerTimer(open.map(_.last).min / 1000L + GapUs / 1000L + 1L)
      }
      closed.iterator.map(s => ClosedSession(key, s.head, s.length.toLong))
    }

    override def handleInputRows(key: Long, rows: Iterator[EvT],
        timerValues: TimerValues): Iterator[ClosedSession] =
      sweep(key, rows.map(_.us).toSeq, timerValues.getCurrentWatermarkInMs() * 1000L)

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      sweep(key, Seq.empty, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  /** Start the transformWithState sessionizer (memory sink, append).
    * Forces the RocksDB provider for the query's lifetime (required by
    * the API), restoring the previous setting after.
    */
  def runToCompletion(spark: SparkSession, dir: String, queryName: String,
      watermark: String = "10 minutes",
      stageBetween: Option[() => Unit] = None): DataFrame = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = EventStream.eventStream(spark, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          col("ts").as("ets"))
        .withWatermark("ets", watermark)
        .as[EvT]
      val closed = evs
        .groupByKey(_.user_id)
        .transformWithState(new SessionProcessor, TimeMode.EventTime(),
          OutputMode.Append(), Encoders.product[ClosedSession])
      val q = closed.writeStream
        .outputMode("append").format("memory").queryName(queryName).start()
      q.processAllAvailable()
      stageBetween.foreach { f => f(); q.processAllAvailable() }
      q.stop()
      spark.table(queryName)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
