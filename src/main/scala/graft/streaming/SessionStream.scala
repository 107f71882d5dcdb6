package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState — the
  * custom-state path of SURVEY.md §2.11 (the streaming twin of the batch
  * window query st2_sessionize). State per user is one (count, lastTs)
  * pair: bounded regardless of stream length.
  *
  * ORDERING CONTRACT: rows are sorted by event id only WITHIN each
  * micro-batch, so the 30-min gap rule matches the batch twin exactly
  * when the source delivers each user's events in event-id order across
  * batches (one file, or files split on event-id boundaries — the
  * StreamingSpec case). A source that interleaves a user's events across
  * out-of-order micro-batches needs event-time state instead: buffer in
  * `GroupState` with an `EventTimeTimeout` watermark and emit sessions on
  * timeout, at the cost of holding a per-user buffer until the watermark
  * passes. The bounded-state version here is the right default for
  * replaying staged event logs, which arrive ordered.
  */
object SessionStream {

  case class Ev(user_id: Long, event_id: Long, us: Long)
  case class SessionState(nSessions: Long, lastUs: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  val GapUs: Long = 1800L * 1000000L // 30 min, matches st2_sessionize

  def sessionize(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[UserSessions] =
    sessionizeMetered(None)(key, rows, state)

  /** [[sessionize]] with an optional per-key peak accumulator. The
    * `rows.toSeq` sort buffer is this operator's REAL memory bound — the
    * cross-batch GroupState is a fixed (count, lastTs) pair, but one hot
    * key's events within one micro-batch all materialize here, so that
    * count is the number a skew investigation needs (the streaming
    * mirror of IntervalJoinExec's peakBufferedRows SQLMetric).
    */
  def sessionizeMetered(peak: Option[StateMetrics.MaxAccumulator])(
      key: Long,
      rows: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[UserSessions] = {
    // within a micro-batch rows are unordered; order by event id (the
    // reference's entry order) before applying the gap rule
    val sorted = rows.toSeq.sortBy(_.event_id)
    peak.foreach(_.add(sorted.length.toLong))
    var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
    var n = 0L
    sorted.foreach { e =>
      val newSession = st.nSessions == 0L || e.us - st.lastUs > GapUs
      st = SessionState(st.nSessions + (if (newSession) 1L else 0L), e.us)
      n += 1
    }
    state.update(st)
    Iterator.single(UserSessions(key, st.nSessions, n))
  }

  /** Run the stateful sessionizer over a directory of events parquet and
    * return the final per-user session counts (memory sink, bounded input).
    */
  def runToCompletion(spark: SparkSession, dir: String, queryName: String): DataFrame =
    runWithStateReport(spark, dir, queryName)._1

  /** [[runToCompletion]] plus the state observability a production run
    * monitors: per-key peak batch buffering and state-store totals.
    */
  def runWithStateReport(spark: SparkSession, dir: String,
      queryName: String): (DataFrame, StreamStateReport) = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val peak = new StateMetrics.MaxAccumulator
    spark.sparkContext.register(peak, s"$queryName.peakEventsPerKeyBatch")
    val evs = spark.readStream
      .schema(EventStream.eventSchema)
      .parquet(dir)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
      .as[Ev]
    val sessions = evs
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        sessionizeMetered(Some(peak)))
    val q = sessions.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    val (stateRows, stateMem) = StateMetrics.stateStoreTotals(q)
    q.stop()
    // update mode emits one row per (user, batch); keep the latest state
    val df = spark.table(queryName)
      .groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), sum("n_events").as("n_events"))
    (df, StreamStateReport(peak.value, stateRows, stateMem))
  }
}
