package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Plan walking shared by the writer-side pruning probe
  * (`SinkOps.rowGroupPruneStats`) and the plan-shape specs
  * (SourcesSpec): descend through AQE wrappers, materialized query
  * stages and reused exchanges to the physical file scans — the nodes
  * whose metrics (`numOutputRows`, `numPartitions`) carry the pruning
  * evidence. One helper so the next AQE wrapper node added by a Spark
  * upgrade is handled in exactly one place.
  */
object PlanScans {
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case qs: QueryStageExec => fileScans(qs.plan)
    case r: ReusedExchangeExec => fileScans(r.child)
    case sc: FileSourceScanExec => Seq(sc)
    case other => other.children.flatMap(fileScans)
  }
}
