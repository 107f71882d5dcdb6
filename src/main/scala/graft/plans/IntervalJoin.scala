package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator Catalyst extension (SURVEY §2.12, the (c) path of the
  * custom-operator preference order): a SORTED INTERVAL JOIN —
  * `left ⋈ right ON l.key = r.key AND r.ts ∈ [l.ts + lo, l.ts + hi]` —
  * as a custom LogicalPlan + SparkStrategy + physical SparkPlan,
  * registered through [[GraftExtensions]].
  *
  * WHY a custom operator: the declarative form (equi-join on key with the
  * time range as a residual filter — st3_interval_join) is correct and
  * fine when per-key cardinality is modest, but its inner loop is
  * O(P_k · E_k) for every key k (each purchase row scans ALL of the
  * user's error rows, then filters). This operator requires both children
  * hash-clustered on the key and sorted by (key, ts) — exactly what
  * EnsureRequirements provides, like a sort-merge join — and sweeps each
  * key once with a monotone window-start pointer: O(P_k + E_k + output).
  * On a skewed key (one user with 100k events each side) that is the
  * difference between 10^10 probes and a linear pass — the same reason
  * production SQL engines ship native range joins. State held per key is the
  * right-side rows of that key only (the same buffering bound as a
  * sort-merge join's duplicate-key match buffer).
  *
  * Scope contract (checked at construction): key is LongType, timestamps
  * are TimestampType/LongType (micros), offsets in micros, inner join,
  * null keys/timestamps match nothing. IntervalJoinSpec pins equality
  * with the declarative plan on real data and on adversarial random
  * fixtures, and that the physical plan contains no residual-filtered
  * nested loop.
  */
case class IntervalJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    loMicros: Long, hiMicros: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, lt, rt, lo, hi) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lo, hi) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    loMicros: Long, hiMicros: Long) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // hash-clustered on the key, co-partitioned; sorted by (key, ts) —
  // EnsureRequirements inserts the exchanges/sorts exactly as for SMJ
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numBufferedRows" -> SQLMetrics.createMetric(sparkContext,
      "right rows buffered (peak per key is the operator's memory bound)"))

  protected override def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val bufRows = longMetric("numBufferedRows")
    val lo = loMicros
    val hi = hiMicros
    val out = output
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTs
    val rt = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter0, rIter0) =>
      val lKeyEval = BindReferences.bindReference(lk, lOut)
      val lTsEval = BindReferences.bindReference(lt, lOut)
      val rKeyEval = BindReferences.bindReference(rk, rOut)
      val rTsEval = BindReferences.bindReference(rt, rOut)
      val joiner = new JoinedRow
      val resultProj = UnsafeProjection.create(out, out)
      val lBuf = lIter0
      val rBuf = rIter0.buffered
      new Iterator[InternalRow] {
        // right rows of the current key, ts-ascending (copies — the
        // child's rows are reused buffers). The per-key memory bound.
        private val rts = new scala.collection.mutable.ArrayBuffer[Long]
        private val rrows = new scala.collection.mutable.ArrayBuffer[InternalRow]
        private var haveKey = false
        private var curKey = 0L
        private var lRow: InternalRow = _
        private var lTsV = 0L
        private var start = 0 // monotone window-start pointer within a key
        private var idx = 0
        private var positioned = false

        private def loadKey(k: Long): Unit = {
          rts.clear(); rrows.clear()
          var done = false
          while (!done && rBuf.hasNext) {
            val hk = rKeyEval.eval(rBuf.head)
            if (hk == null) { rBuf.next() } // null keys match nothing
            else if (hk.asInstanceOf[Long] < k) rBuf.next()
            else if (hk.asInstanceOf[Long] == k) {
              val r = rBuf.next().copy()
              val ts = rTsEval.eval(r)
              if (ts != null) { rrows += r; rts += ts.asInstanceOf[Long]; bufRows += 1 }
            } else done = true
          }
          curKey = k; haveKey = true; start = 0
        }

        /** Position (lRow, idx) at the next match WITHOUT materializing a
          * row — materialization happens only in next(), into the reused
          * projection buffer, per the iterator-row-reuse contract. (A
          * lookahead that projected eagerly would clobber the row the
          * consumer is still holding.)
          */
        private def findNext(): Boolean = {
          while (true) {
            if (lRow != null && idx < rrows.length && rts(idx) <= lTsV + hi) {
              return true // entries from `start` are ≥ lTsV + lo by pruning
            }
            if (!lBuf.hasNext) { lRow = null; return false }
            lRow = lBuf.next()
            val k = lKeyEval.eval(lRow)
            val ts = lTsEval.eval(lRow)
            if (k == null || ts == null) { lRow = null } // matches nothing
            else {
              lTsV = ts.asInstanceOf[Long]
              if (!haveKey || k.asInstanceOf[Long] != curKey) loadKey(k.asInstanceOf[Long])
              while (start < rts.length && rts(start) < lTsV + lo) start += 1
              idx = start
            }
          }
          false // unreachable
        }

        override def hasNext: Boolean =
          positioned || { positioned = findNext(); positioned }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty interval-join iterator")
          positioned = false
          val out = resultProj(joiner(lRow, rrows(idx)))
          idx += 1
          outRows += 1
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API: `IntervalJoin.join(left, right, "user_id", "user_id",
  * "pts", "ets", lo, hi)` — requires [[IntervalJoinStrategy]] in the
  * session (via [[GraftExtensions]] or
  * `spark.experimental.extraStrategies`).
  */
object IntervalJoin {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      loMicros: Long, hiMicros: Long): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    // self-join guard: the identity output projection binds by exprId, so
    // a shared attribute (both sides derived from one DataFrame without
    // re-aliasing) would silently read the LEFT side's values for the
    // right column. Dataset.join dedups during analysis; this API
    // bypasses analysis, so it must refuse instead.
    val shared = lPlan.outputSet.intersect(rPlan.outputSet)
    require(shared.isEmpty,
      s"interval join sides share attributes ${shared.toSeq.map(_.name).mkString(", ")} — " +
        "re-alias one side (e.g. .toDF(renamed columns...)) before joining")
    require(lk.dataType == LongType && rk.dataType == LongType,
      s"interval join keys must be LongType, got ${lk.dataType}/${rk.dataType}")
    Seq(lt, rt).foreach(a => require(
      a.dataType == TimestampType || a.dataType == LongType,
      s"interval join timestamps must be TimestampType or LongType, got ${a.dataType}"))
    GraftSql.ofRows(left.sparkSession,
      IntervalJoinPlan(lPlan, rPlan, lk, rk, lt, rt, loMicros, hiMicros))
  }
}
