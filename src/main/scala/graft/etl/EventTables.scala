package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic family-A event tables (FIXTURES.md §A1/A2): one row per
  * event, ragged tensors as flattened array + `_shape` columns —
  * the ubparquet data model (/root/reference/dlmerged2parquet.py:271-279).
  * Deterministic (seeded per event id) so specs are reproducible.
  */
object EventTables {

  case class SpacepointEvent(
      run: Long, subrun: Long, event: Long,
      spacepoint_t: Array[Float], spacepoint_t_shape: Array[Long],
      truetriplet_t: Array[Long], truetriplet_t_shape: Array[Long],
      segment_t: Array[Long], segment_t_shape: Array[Long],
      instance_t: Array[Long], instance_t_shape: Array[Long])

  case class VoxelEvent(
      run: Long, subrun: Long, event: Long,
      voxcoord: Array[Long], voxcoord_shape: Array[Long],
      voxfeat: Array[Float], voxfeat_shape: Array[Long],
      voxlabel: Array[Long], voxlabel_shape: Array[Long],
      voxssnet: Array[Long], voxssnet_shape: Array[Long],
      voxinstance: Array[Long], voxinstance_shape: Array[Long])

  /** N events × ~nPoints spacepoints in the detector box
    * (x∈[0,256], y∈[−117,117], z∈[0,1036], detectoroutline.py:5-7).
    */
  def spacepoints(spark: SparkSession, nEvents: Int, nPoints: Int): DataFrame = {
    import spark.implicits._
    (0 until nEvents).map { ev =>
      val rng = new scala.util.Random(1000 + ev)
      val n = nPoints + rng.nextInt(nPoints / 2 + 1)
      val pts = Array.fill(n * 4)(0f)
      val truth = new Array[Long](n)
      val seg = new Array[Long](n)
      val inst = new Array[Long](n)
      for (i <- 0 until n) {
        pts(i * 4) = rng.nextFloat() * 256f
        pts(i * 4 + 1) = rng.nextFloat() * 234f - 117f
        pts(i * 4 + 2) = rng.nextFloat() * 1036f
        pts(i * 4 + 3) = rng.nextFloat() * 100f
        truth(i) = if (rng.nextFloat() < 0.7f) 1L else 0L
        seg(i) = rng.nextInt(7).toLong
        inst(i) = rng.nextInt(10).toLong
      }
      SpacepointEvent(1L, 0L, ev.toLong,
        pts, Array(n.toLong, 4L),
        truth, Array(n.toLong),
        seg, Array(n.toLong),
        inst, Array(n.toLong))
    }.toDF()
  }

  /** N events × ~nVox voxels with labels; voxel coords are unique within
    * an event (the reference's hard invariant, larvoxel_dataset.py:101-110).
    */
  def voxels(spark: SparkSession, nEvents: Int, nVox: Int): DataFrame = {
    import spark.implicits._
    (0 until nEvents).map { ev =>
      val rng = new scala.util.Random(2000 + ev)
      val coords = scala.collection.mutable.LinkedHashSet.empty[(Long, Long, Long)]
      while (coords.size < nVox)
        coords += ((rng.nextInt(256).toLong, rng.nextInt(234).toLong, rng.nextInt(1036).toLong))
      val cs = coords.toArray
      val m = cs.length
      val coordFlat = cs.flatMap { case (x, y, z) => Array(x, y, z) }
      val feat = Array.fill(m * 3)(rng.nextFloat() * 40f)
      val label = Array.fill(m)(if (rng.nextFloat() < 0.8f) 1L else 0L)
      val ssnet = Array.fill(m)(rng.nextInt(7).toLong)
      val inst = Array.fill(m)(rng.nextInt(8).toLong)
      VoxelEvent(1L, 0L, ev.toLong,
        coordFlat, Array(m.toLong, 3L),
        feat, Array(m.toLong, 3L),
        label, Array(m.toLong),
        ssnet, Array(m.toLong),
        inst, Array(m.toLong))
    }.toDF()
  }
}
