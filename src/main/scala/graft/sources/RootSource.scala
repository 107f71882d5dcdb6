package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.FileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileDataSourceV2
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `format("root")` — the reference's event-store opening surface (S1–S4)
  * as a Spark DataSource V2 [[FileDataSourceV2]].
  *
  * The reference opens a ROOT event store, SELECTS WHICH PRODUCTS (trees)
  * to materialize, sets decode options, then iterates entries:
  *
  *   - larlite: `set_data_to_read(kMCTrack, "mcreco")` …
  *     (/root/reference/dlmerged2parquet.py:32-39)
  *   - larcv: `specify_data_read(kProductImage2D, treename)`,
  *     `kTickBackward` / `reverse_all_products()`
  *     (/root/reference/dlmerged2parquet.py:41-50)
  *   - TChain multi-file chaining + txt manifests
  *     (/root/reference/larvoxel_dataset.py:19-43, 51-54)
  *
  * This environment has no ROOT C++ stack (SURVEY §7.4), so the physical
  * decode happens in an upstream ingest job and this source reads the
  * STAGED PARQUET those jobs produce — but it preserves the reference's
  * API shape and its performance semantics:
  *
  *   - `spark.read.format("root").load(p1, p2, …)` — true varargs (S4's
  *     TChain shape; the V2 provider receives every path, where the old
  *     V1 `RelationProvider` only ever saw one). Each path may also be a
  *     directory, a Hadoop glob (`dir/{a,b}`, `*.parquet`), a comma-list
  *     (`p1,p2` — kept for compatibility), or a `.txt` manifest of paths
  *     (S5 file-list resolution; one line per file, `#` comments).
  *   - `option("products", "mcreco,generator")` — product selection, the
  *     reference's `set_data_to_read`/`specify_data_read`. Implemented as
  *     a restricted table schema, so unselected products are pruned
  *     before scan planning and never read (parquet is columnar; in ROOT
  *     the same option skips tree branches).
  *   - `option("mergeSchema", true|false)` — multi-file schema union
  *     (S7), default TRUE here (event files written over months drift in
  *     schema), unlike raw parquet's false.
  *   - `option("tickBackward", true)` — accepted for API parity. In the
  *     reference this flips image row decode order at READ time; staged
  *     parquet is already decoded tick-forward, so it is a no-op here and
  *     that is logged once rather than silently swallowed.
  *
  * Being a V2 [[FileDataSourceV2]] whose table IS Spark's own
  * [[ParquetTable]], the facade inherits the vectorized columnar batch
  * reader and the full V2 pushdown surface (`ParquetScanBuilder`
  * implements column pruning, predicate pushdown to parquet
  * row-group/page stats, aggregate pushdown, and runtime filtering) —
  * a `format("root")` user pays exactly the native parquet scan cost.
  * RootSourceSpec pins PushedFilters/ReadSchema crossing the facade and
  * the varargs load.
  */
class RootSource extends FileDataSourceV2 {

  override def fallbackFileFormat: Class[_ <: FileFormat] = classOf[ParquetFileFormat]

  override def shortName(): String = "root"

  /** Comma-list and `.txt`-manifest resolution layered on the V2
    * path/paths options; globs and directories pass through to the file
    * index's own expansion.
    */
  private def resolvedPaths(options: CaseInsensitiveStringMap): Seq[String] =
    getPaths(options)
      .flatMap(RootSource.splitPathList)
      .flatMap(RootSource.resolveManifest(sparkSession, _))

  /** Facade option handling: default mergeSchema=true, log the
    * tickBackward no-op, strip facade-only keys before handing the
    * options to the parquet table.
    */
  private def parquetOptions(options: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    if (options.getBoolean("tickBackward", false)) {
      org.slf4j.LoggerFactory.getLogger(classOf[RootSource]).info(
        "tickBackward=true: staged parquet is already decoded tick-forward; option is a read-order no-op here")
    }
    val m = new java.util.HashMap[String, String](getOptionsWithoutPaths(options))
    m.remove("products")
    m.remove("tickbackward")
    if (!m.containsKey("mergeschema")) m.put("mergeSchema", "true")
    new CaseInsensitiveStringMap(m)
  }

  /** Validated product restriction of a full schema (the reference's
    * set_data_to_read/specify_data_read contract: asking for a missing
    * product is an error, not a silent empty column).
    */
  private def restrict(full: StructType, products: String): StructType = {
    val want = products.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val have = full.fieldNames.toSet
    val missing = want.filterNot(have)
    require(missing.isEmpty,
      s"products not in store: ${missing.mkString(", ")} (have: ${full.fieldNames.mkString(", ")})")
    StructType(want.map(full(_)))
  }

  override def getTable(options: CaseInsensitiveStringMap): Table = {
    // resolve paths (manifest reads, comma-lists) and options ONCE; the
    // products-restricted table reuses them, paying only the base
    // table's schema inference (the restricted one gets its schema
    // explicitly, so no second footer pass)
    val paths = resolvedPaths(options)
    val popts = parquetOptions(options)
    def build(userSchema: Option[StructType]) = ParquetTable(
      getTableName(options, paths), sparkSession, popts, paths, userSchema,
      fallbackFileFormat)
    Option(options.get("products")) match {
      case None => build(None)
      case Some(ps) => build(Some(restrict(build(None).schema, ps)))
    }
  }

  override def getTable(options: CaseInsensitiveStringMap, schema: StructType): Table = {
    // a user-supplied schema composes with products the same way (and
    // keeps the missing-product validation) instead of silently ignoring
    // the option
    val paths = resolvedPaths(options)
    val effective = Option(options.get("products"))
      .map(restrict(schema, _)).getOrElse(schema)
    ParquetTable(getTableName(options, paths), sparkSession,
      parquetOptions(options), paths, Some(effective), fallbackFileFormat)
  }
}

object RootSource {

  /** Split a comma-list of paths, leaving commas inside `{a,b}` brace
    * globs to Hadoop's glob expansion.
    */
  private[sources] def splitPathList(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '{' => depth += 1; cur += '{'
      case '}' => depth -= 1; cur += '}'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** S5: a `.txt` path is a manifest — one data-file path per line. */
  private[sources] def resolveManifest(spark: SparkSession, path: String): Seq[String] =
    if (path.endsWith(".txt")) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new org.apache.hadoop.fs.Path(path))
      try scala.io.Source.fromInputStream(in).getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toList
      finally in.close()
    } else Seq(path)
}

/** Driver-gate coverage for the facade: the same scan shape a reference
  * user's first query takes (open store, select products, filter),
  * hash-compared against DuckDB reading the parquet directly — proving
  * `format("root")` is a transparent overlay, not a fork of the data.
  */
object RootSourceOps extends graft.OpModule {
  val qs: Seq[graft.Q] = Seq(
    graft.Q("s1_root_facade", Some(
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey >= 2 ORDER BY n_nationkey""".stripMargin),
      (s, dir) => s.read.format("root")
        .option("products", "n_nationkey,n_name,n_regionkey")
        .load(s"$dir/nation.parquet")
        .filter(col("n_regionkey") >= 2)
        .orderBy("n_nationkey"))
  )
}
