package graft.etl

import graft.tensor.TensorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native re-expressions of the reference's ETL/derived-table
  * pipelines over the family-A event tables. Each pipeline is one
  * declarative Catalyst plan: the reference's per-entry Python loops
  * (/root/reference/dlmerged2parquet.py:122-282,
  * voxel_to_instance_data.py:23-65) become partition-parallel dataflows
  * with a single shuffle per aggregation.
  */
object EventPipelines {

  /** Long-form view of the spacepoint table: one row per point, via the
    * tensor_explode generator, keeping parallel label columns positionally
    * aligned by a single shared explode (SURVEY.md §7.4: never explode
    * parallel arrays independently).
    */
  def spacepointsLong(spark: SparkSession, events: DataFrame): DataFrame = {
    TensorFunctions.register(spark)
    events.createOrReplaceTempView("sp_events")
    spark.sql(
      """SELECT run, subrun, event, t.idx AS pt,
        |  element_at(t.slice, 1) AS x, element_at(t.slice, 2) AS y,
        |  element_at(t.slice, 3) AS z, element_at(t.slice, 4) AS charge,
        |  element_at(truetriplet_t, t.idx + 1) AS truetriplet,
        |  element_at(segment_t, t.idx + 1) AS segment,
        |  element_at(instance_t, t.idx + 1) AS instance
        |FROM sp_events
        |LATERAL VIEW tensor_explode(spacepoint_t, spacepoint_t_shape) t AS idx, slice
        |""".stripMargin)
  }

  /** V1 voxelization: bin spacepoints to integer voxel coords at
    * `voxelSizeCm`, keep only true (non-ghost) points, aggregate charge
    * and the majority-vote ssnet label per voxel with argmax-bincount
    * tie-breaking (lowest label wins on count ties,
    * voxel_to_instance_data.py:63).
    */
  def voxelize(spark: SparkSession, events: DataFrame, voxelSizeCm: Double): DataFrame = {
    val long = spacepointsLong(spark, events)
      .filter(col("truetriplet") === 1)
      .withColumn("vx", floor(col("x") / voxelSizeCm))
      .withColumn("vy", floor((col("y") + 117.0) / voxelSizeCm))
      .withColumn("vz", floor(col("z") / voxelSizeCm))
    val counts = long.groupBy("run", "subrun", "event", "vx", "vy", "vz", "segment")
      .agg(count(lit(1)).as("cnt"), sum(col("charge").cast("double")).as("q"))
    val w = Window.partitionBy("run", "subrun", "event", "vx", "vy", "vz")
    counts
      .withColumn("rn", row_number().over(w.orderBy(col("cnt").desc, col("segment").asc)))
      .withColumn("npts", sum(col("cnt")).over(w))
      .withColumn("charge", sum(col("q")).over(w))
      .filter(col("rn") === 1)
      .select(col("run"), col("subrun"), col("event"),
        col("vx"), col("vy"), col("vz"),
        col("npts"), col("charge"), col("segment").as("ssnet"))
  }

  /** Shared long view of a voxel event table: one row per non-ghost
    * voxel, integer grid coords (ix, iy, iz) for adjacency plus the
    * shifted output doubles (y − 117), the ssnet label, and the
    * as-given instance label.
    */
  private def voxelLong(spark: SparkSession, voxels: DataFrame): DataFrame = {
    TensorFunctions.register(spark)
    voxels.createOrReplaceTempView("vox_events")
    spark.sql(
      """SELECT run, subrun, event, t.idx AS i,
        |  element_at(t.slice, 1) AS ix,
        |  element_at(t.slice, 2) AS iy,
        |  element_at(t.slice, 3) AS iz,
        |  CAST(element_at(t.slice, 1) AS DOUBLE) AS x,
        |  CAST(element_at(t.slice, 2) AS DOUBLE) - 117.0 AS y,
        |  CAST(element_at(t.slice, 3) AS DOUBLE) AS z,
        |  element_at(voxlabel, t.idx + 1) AS voxlabel,
        |  element_at(voxssnet, t.idx + 1) AS ssnet,
        |  element_at(voxinstance, t.idx + 1) AS instance
        |FROM vox_events
        |LATERAL VIEW tensor_explode(voxcoord, voxcoord_shape) t AS idx, slice
        |""".stripMargin)
      .filter(col("voxlabel") === 1)
  }

  /** The §3.3 aggregation grain over a long voxel view carrying an
    * `instance` column (given labels for [[instanceTable]], CC-derived
    * for [[instanceTableCC]]): majority-vote ssnet label per instance
    * (ties → lowest), member coords re-encoded flatten+shape,
    * canonically sorted so output is deterministic under shuffle.
    */
  private def aggregateInstances(long: DataFrame): DataFrame = {
    val labelW = Window.partitionBy("run", "subrun", "event", "instance")
    val labels = long.groupBy("run", "subrun", "event", "instance", "ssnet")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(labelW.orderBy(col("cnt").desc, col("ssnet").asc)))
      .filter(col("rn") === 1)
      .select(col("run"), col("subrun"), col("event"), col("instance"),
        col("ssnet").as("label"))
    val clusters = long
      .groupBy("run", "subrun", "event", "instance")
      .agg(array_sort(collect_list(struct(col("i"), col("x"), col("y"), col("z")))).as("pts"))
      .select(col("run"), col("subrun"), col("event"), col("instance"),
        flatten(transform(col("pts"),
          p => array(p.getField("x"), p.getField("y"), p.getField("z")))).as("instvoxcoord"),
        array(size(col("pts")).cast("long"), lit(3L)).as("instvoxcoord_shape"))
    clusters.join(labels, Seq("run", "subrun", "event", "instance"))
  }

  /** §3.3 derived-table pipeline (voxel_to_instance_data.py): voxel event
    * table → instance-cluster table, grouped by the GIVEN instance label.
    * Ghost filter, y −117 shift, majority-vote ssnet label (ties →
    * lowest), member coords re-encoded in the flatten+shape convention.
    */
  def instanceTable(spark: SparkSession, voxels: DataFrame): DataFrame =
    aggregateInstances(voxelLong(spark, voxels))

  /** §3.3 with the reference's FLOOD-FILL instance grain: when the voxel
    * table carries no trusted instance labels, the instance id is
    * DERIVED by 6-neighborhood connected components over each event's
    * occupancy grid — the reference's dense-array flood fill
    * (voxel_to_instance_data.py's cluster step, larmatch instance
    * grain) re-expressed as v7's sparse machinery
    * ([[graft.ops.GraphOps.connectedComponents]]).
    *
    * Voxel coords pack into ONE BIGINT node id
    * (event-index ≪ 33 | ix ≪ 22 | iy ≪ 11 | iz; each coord < 2048 —
    * the detector box is 256×234×1036 at 1 cm, FIXTURES.md §A2, and
    * the packing is checked). Because the packing is affine, the
    * +1-in-one-axis neighbor is `id + 2^22 / 2^11 / 1`, so adjacency
    * is three self equi-joins on a single LONG key — no composite-key
    * or distance join anywhere, occupied cells only. The event-index
    * comes from a row_number over the DISTINCT (run, subrun, event)
    * set — event-metadata cardinality, never voxels, the ev6
    * calendar-window posture. Derived instance id = the component's
    * minimum packed id (deterministic under shuffle); isolated voxels
    * label themselves. Downstream is [[instanceTable]]'s own
    * aggregation applied to the derived grain.
    */
  def instanceTableCC(spark: SparkSession, voxels: DataFrame): DataFrame = {
    val long = voxelLong(spark, voxels)
    val evs = long.select("run", "subrun", "event").distinct()
      .withColumn("evi",
        row_number().over(Window.orderBy("run", "subrun", "event")).cast("long"))
    // Coords must stay ≤ 2046: at 2047 the +1-neighbor id would CARRY
    // into the next packed field (z=2047 → y+1, y=2047 → x+1, x=2047 →
    // next event) and the affine-shift join would fabricate adjacency
    // between non-neighboring cells. Rejecting ≥ 2047 keeps every
    // +1 probe inside its own field — the probe id may name a cell
    // that cannot exist (coord 2047), which simply matches nothing.
    val withId = long.join(broadcast(evs), Seq("run", "subrun", "event"))
      .withColumn("id", when(
        col("ix") < 0 || col("ix") >= 2047 || col("iy") < 0 || col("iy") >= 2047 ||
          col("iz") < 0 || col("iz") >= 2047,
        expr("raise_error('voxel coord outside packable range [0, 2047)')").cast("long"))
        .otherwise(expr("evi * 8589934592L + ix * 4194304L + iy * 2048L + iz")))
    val nodes = withId.select("id").localCheckpoint(true)
    val edges = Seq(1L << 22, 1L << 11, 1L).map { s =>
      nodes.as("x")
        .join(nodes.select(col("id").as("nid")), col("nid") === col("id") + s)
        .select(col("id").as("a"), col("nid").as("b"))
    }.reduce(_ union _)
    // 30 pointer-jumping rounds reach diameter 2^31 — beyond any chain
    // the 2047³ grid can hold — and earlyStop exits at ACTUAL
    // convergence, so the ceiling costs nothing on real data;
    // connectedComponents now THROWS if an earlyStop budget is
    // exhausted unconverged, so a snaking track can split silently
    // nowhere (the CC scaladoc's clique assumption does not hold for
    // occupancy chains — this caller is the worst case)
    // dedupe=false: the three affine-shift self equi-joins emit each
    // directed pair at most once (distinct shift deltas cannot produce
    // the same (a, b) twice), and duplicates would be harmless to
    // min-propagation anyway — the edge-list distinct is pure cost here
    val comp = graft.ops.GraphOps.connectedComponents(edges, maxIter = 30,
      dedupe = false)
    val derived = withId.join(comp, Seq("id"), "left")
      .withColumn("instance", coalesce(col("comp"), col("id")))
    aggregateInstances(derived.drop("id", "comp", "evi"))
  }

  /** V4 triplet formation analog: three per-plane hit tables joined on
    * the shared time tick — a three-way equi-join producing candidate
    * 3-D points (PrepMatchTriplets, dlmerged2parquet.py:211-212).
    */
  def tripletJoin(plane0: DataFrame, plane1: DataFrame, plane2: DataFrame): DataFrame = {
    val p0 = plane0.select(col("tick"), col("wire").as("u"), col("adc").as("adc_u"))
    val p1 = plane1.select(col("tick"), col("wire").as("v"), col("adc").as("adc_v"))
    val p2 = plane2.select(col("tick"), col("wire").as("y"), col("adc").as("adc_y"))
    p0.join(p1, "tick").join(p2, "tick")
      .filter(col("adc_u") > 10.0 && col("adc_v") > 10.0 && col("adc_y") > 10.0)
      .select(col("tick"), col("u"), col("v"), col("y"),
        (col("adc_u") + col("adc_v") + col("adc_y")).as("adc_sum"))
  }
}
