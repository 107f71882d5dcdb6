package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.AccumulatorV2

/** Observability for stateful streaming operators, mirroring
  * IntervalJoinExec's SQLMetrics on the batch side (VERDICT r4 stretch
  * #8): a 100 TB stateful operator needs to SEE its per-key hot spots —
  * total state rows say nothing about one bot user holding a million
  * buffered events.
  */
object StateMetrics {

  /** Max-aggregating accumulator (Spark ships sum/count ones only):
    * tracks the PEAK of a per-key quantity across all tasks and batches —
    * the number every skew investigation starts from.
    */
  class MaxAccumulator extends AccumulatorV2[Long, Long] {
    private var _max = 0L
    override def isZero: Boolean = _max == 0L
    override def copy(): MaxAccumulator = { val a = new MaxAccumulator; a._max = _max; a }
    override def reset(): Unit = _max = 0L
    override def add(v: Long): Unit = if (v > _max) _max = v
    override def merge(other: AccumulatorV2[Long, Long]): Unit =
      if (other.value > _max) _max = other.value
    override def value: Long = _max
  }

  /** State-store totals of the most recent progress that carried state
    * operators: (state rows, state memory bytes). The per-operator
    * numbers Spark already tracks — surfaced here next to the per-key
    * peak so both granularities read from one place.
    */
  def stateStoreTotals(q: StreamingQuery): (Long, Long) = {
    val ps = q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
    ps.map { p =>
      (p.stateOperators.map(_.numRowsTotal).sum,
        p.stateOperators.map(_.memoryUsedBytes).sum)
    }.getOrElse((0L, 0L))
  }
}

/** One run's state observability: the per-key peak (from the operator's
  * own accumulator) plus the state-store totals (from query progress).
  */
final case class StreamStateReport(
    peakPerKey: Long, stateRows: Long, stateMemoryBytes: Long)
