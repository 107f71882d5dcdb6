package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `format("root")` — the reference's event-store opening surface (S1–S4)
  * as a Spark data source.
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
  *     (/root/reference/larvoxel_dataset.py:19-43)
  *
  * This environment has no ROOT C++ stack (SURVEY §7.4), so the physical
  * decode happens in an upstream ingest job and this source reads the
  * STAGED PARQUET those jobs produce — but it preserves the reference's
  * API shape and its performance semantics:
  *
  *   - `spark.read.format("root").load(p)` — a directory, a Hadoop glob
  *     (`dir/{a,b}` or a `*.parquet` wildcard), a comma-list (`p1,p2` —
  *     S4's TChain shape; V1 sources never see `.load(…)` varargs), or a
  *     `.txt` manifest of paths (S5 file-list resolution; one line per
  *     file, `#` comments allowed).
  *   - `option("products", "mcreco,generator")` — product selection, the
  *     reference's `set_data_to_read`/`specify_data_read`. Maps to column
  *     pruning BEFORE scan-time, so unselected products are never read
  *     (parquet is columnar; in ROOT the same option skips tree branches).
  *   - `option("mergeSchema", true|false)` — multi-file schema union (S7),
  *     default true: event files written over months drift in schema.
  *   - `option("tickBackward", true)` — accepted for API parity. In the
  *     reference this flips image row decode order at READ time; staged
  *     parquet is already decoded tick-forward, so it is a no-op here and
  *     that is logged once rather than silently swallowed.
  *
  * Column pruning and filter pushdown CROSS the facade: the relation
  * implements [[PrunedFilteredScan]], and `buildScan` re-applies the
  * pruned projection and pushed predicates to the inner parquet
  * DataFrame — Catalyst then pushes them into the parquet reader itself
  * (verified in RootSourceSpec via the inner plan's PushedFilters), so a
  * `format("root")` user pays the same scan cost as a native
  * `spark.read.parquet` user. Spark re-evaluates every filter above this
  * relation (the V1 contract), so partially translated predicates stay
  * correct.
  */
class RootSource extends RelationProvider with DataSourceRegister {

  override def shortName(): String = "root"

  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val spark = ctx.sparkSession
    // V1 RelationProviders only receive `.load(one)` (as "path") — the
    // varargs of `.load(p1, p2, …)` stay on the FileFormat-only DataSource
    // and never reach createRelation. Multi-file chaining (S4's TChain)
    // therefore rides in ONE string: a comma-list, a Hadoop glob
    // (`dir/{f1,f2}`, `dir/*.parquet`), a directory, or a .txt manifest.
    val raw = parameters.get("path")
      .map(splitPathList)
      .getOrElse(throw new IllegalArgumentException(
        "format(\"root\") needs a path: .load(dir | glob | p1,p2 | manifest.txt)"))
    val paths = raw.flatMap(resolveManifest(spark, _))
    val mergeSchema = parameters.getOrElse("mergeSchema", "true")
    if (parameters.get("tickBackward").exists(_.toBoolean)) {
      org.slf4j.LoggerFactory.getLogger(classOf[RootSource]).info(
        "tickBackward=true: staged parquet is already decoded tick-forward; option is a read-order no-op here")
    }
    val base = spark.read.option("mergeSchema", mergeSchema).parquet(paths: _*)
    val projected = parameters.get("products") match {
      case Some(ps) =>
        val want = ps.split(",").map(_.trim).filter(_.nonEmpty)
        val have = base.columns.toSet
        val missing = want.filterNot(have)
        require(missing.isEmpty,
          s"products not in store: ${missing.mkString(", ")} (have: ${base.columns.mkString(", ")})")
        base.select(want.map(col).toSeq: _*)
      case None => base
    }
    new RootRelation(ctx, projected)
  }

  /** Split a comma-list of paths, leaving commas inside `{a,b}` brace
    * globs to Hadoop's glob expansion.
    */
  private def splitPathList(s: String): Seq[String] = {
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
  private def resolveManifest(spark: org.apache.spark.sql.SparkSession, path: String): Seq[String] =
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

/** The facade relation: scan requests are re-issued against the inner
  * parquet DataFrame so Catalyst's own pushdown applies to them.
  */
class RootRelation(ctx: SQLContext, inner: DataFrame)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx
  override def schema: StructType = inner.schema

  // Spark always re-applies filters above a V1 relation unless told
  // otherwise; translation below is a scan-cost optimization, never a
  // correctness dependency.
  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val pruned =
      if (requiredColumns.isEmpty) inner.select(col(inner.columns.head)) // COUNT(*) scan
      else inner.select(requiredColumns.map(col).toIndexedSeq: _*)
    val filtered = filters.flatMap(translate).foldLeft(pruned)(_ filter _)
    filtered.rdd
  }

  /** sources.Filter → Column for the pushable subset; None leaves the
    * predicate to Spark's re-evaluation above the relation.
    */
  private def translate(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case StringEndsWith(a, s) => Some(col(a).endsWith(s))
    case StringContains(a, s) => Some(col(a).contains(s))
    case And(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r) => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}
