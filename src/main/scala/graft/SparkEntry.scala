package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Aggregates every operator module's named queries. Each query name is
  * keyed to the SURVEY.md §2 operator inventory; entries with ANSI-SQL
  * equivalents carry a DuckDB oracle for the driver's hash compare.
  */
object SparkEntry {

  private def modules: Seq[OpModule] = Seq(
    ops.RelationalOps, ops.AggOps, ops.WindowOps, ops.EventOps,
    ops.ArrayOps, ops.SamplingOps, ops.VectorSumAgg, ops.MisraGriesOps,
    ops.TpchOps, ops.ScalarOps, ops.GraphOps, ops.AnalyticsOps, ops.FeatureOps,
    quality.TextOps, quality.DedupOps, quality.SimilarityOps, quality.ClusterOps,
    quality.EntityOps, quality.Multimodal,
    quality.CorpusPipeline, sources.RootSourceOps, sources.LayoutOps, etl.SinkOps,
    etl.IvmOps)

  lazy val all: Seq[Q] = {
    val qs = modules.flatMap(_.qs)
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.RelationalOps.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sampling, xxhash64-based sketches) → driver records a rows-only
    * check; those are covered by ScalaTest specs instead.
    */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, Some(sql), _) => n -> sql }.toMap
}
