package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames — the engine's
  * answer to the reference's graph step (radius_graph + scatter
  * aggregation, /root/reference/larennet/larennet.py:53-61) and the final
  * stage of any dedup pipeline: turning near-dup pairs into clusters.
  */
object GraphOps {

  /** Connected components by iterative min-label propagation: each
    * vertex repeatedly adopts the smallest component id among itself and
    * its neighbors. Converges in O(component diameter) rounds — near-dup
    * graphs are dense cliques with tiny diameters, so a handful of
    * rounds suffices at any scale. Each round is one equi-join + one
    * aggregation (both shuffle-partitioned by vertex id); intermediate
    * results are cached and released round-by-round.
    *
    * @param pairs undirected edges (a, b)
    * @return (id, comp) — comp is the minimum vertex id of the component
    */
  /** @param earlyStop run a convergence-check job each round (costs one
    *   extra job per round; disable for graphs with known small diameter
    *   and set maxIter to that bound instead).
    * @param verify only meaningful with earlyStop=false: VERIFY the fixed
    *   budget after the last round — if labels are still changing,
    *   propagation resumes with per-round checks (up to 16 more rounds)
    *   and throws if still unconverged, rather than silently emitting
    *   split clusters. Off by default so fixed-budget callers keep their
    *   cost bound: earlyStop=false && verify=false runs EXACTLY maxIter
    *   rounds and returns best-effort labels.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
      earlyStop: Boolean = true, verify: Boolean = false): DataFrame = {
    // localCheckpoint (not cache): each round's plan must be TRUNCATED,
    // or the logical plan doubles every iteration and analysis time
    // explodes — the standard iterative-DataFrame trap.
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)

    def step(cur: DataFrame): DataFrame = {
      val neighborMin = edges
        .join(cur.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("id"))
        .agg(min("comp").as("ncomp"))
      val stepped = cur
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // pointer jumping: adopt the label's own label too — chains collapse
      // in O(log diameter) rounds instead of O(diameter)
      stepped.as("x")
        .join(stepped.select(col("id").as("cid"), col("comp").as("ccomp")).as("y"),
          col("x.comp") === col("y.cid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.comp"), coalesce(col("y.ccomp"), col("x.comp"))).as("comp"))
        .localCheckpoint(true)
    }
    def changed(next: DataFrame, cur: DataFrame): Boolean =
      next.as("u")
        .join(cur.as("l"), col("u.id") === col("l.id"))
        .filter(col("u.comp") =!= col("l.comp"))
        .limit(1).count() > 0

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val updated = step(labels)
      if (earlyStop) converged = !changed(updated, labels)
      labels = updated
      i += 1
    }
    if (!earlyStop && verify) {
      // post-hoc convergence guarantee (one cheap check; the graph here is
      // the tiny representative graph, so extra rounds are cheap too)
      var extra = 0
      var stable = false
      while (!stable && extra < 16) {
        val updated = step(labels)
        stable = !changed(updated, labels)
        labels = updated
        extra += 1
      }
      require(stable,
        s"connectedComponents: labels still changing after $maxIter+$extra rounds")
    }
    labels
  }
}
