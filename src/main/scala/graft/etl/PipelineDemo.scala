package graft.etl

import graft.tensor.TensorFunctions
import org.apache.spark.sql.SparkSession

/** End-to-end demo of the ubparquet-shaped pipelines: generate family-A
  * event tables, voxelize spacepoints, derive the instance-cluster table
  * (§3.3), write both as parquet, read back and report. Usage:
  * `sbt "runMain graft.etl.PipelineDemo /tmp/graft_demo"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_demo")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TensorFunctions.register(spark)

    val sp = EventTables.spacepoints(spark, nEvents = 4, nPoints = 500)
    val vox = EventPipelines.voxelize(spark, sp, voxelSizeCm = 5.0)
    vox.write.mode("overwrite").option("compression", "gzip").parquet(s"$out/voxels")

    val voxEvents = EventTables.voxels(spark, nEvents = 4, nVox = 300)
    val inst = EventPipelines.instanceTable(spark, voxEvents)
    inst.write.mode("overwrite").option("compression", "gzip").parquet(s"$out/instances")

    // the reference's flood-fill grain: instances DERIVED by occupancy
    // CC (v7) instead of the given labels — the path a table without
    // trusted instance labels takes
    val instCC = EventPipelines.instanceTableCC(spark, voxEvents)
    instCC.write.mode("overwrite").option("compression", "gzip").parquet(s"$out/instances_cc")

    val voxBack = spark.read.parquet(s"$out/voxels")
    val instBack = spark.read.parquet(s"$out/instances")
    val instCCBack = spark.read.parquet(s"$out/instances_cc")
    println(s"[demo] voxels: ${voxBack.count()} rows, " +
      s"schema=${voxBack.schema.map(_.name).mkString(",")}")
    println(s"[demo] instances: ${instBack.count()} rows, " +
      s"schema=${instBack.schema.map(_.name).mkString(",")}")
    println(s"[demo] instances_cc (flood-fill grain): ${instCCBack.count()} rows")
    val sample = instBack.selectExpr("instance", "label", "instvoxcoord_shape")
      .orderBy("event", "instance").limit(3).collect()
    sample.foreach(r => println(s"[demo] instance=${r.get(0)} label=${r.get(1)} shape=${r.get(2)}"))
    spark.stop()
  }
}
