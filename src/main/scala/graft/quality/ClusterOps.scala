package graft.quality

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed k-means (Lloyd's algorithm) over the embedding corpus —
  * the clustering primitive behind corpus curation (SemDeDup's coarse
  * quantizer, dd10, runs ONE of these rounds; cluster-balanced sampling
  * and domain discovery run several). Extends the reference's similarity
  * toolkit (/root/reference/dedup/semdedup.py's fixed clustering step)
  * to the full iterative fit.
  *
  * Scale shape — the textbook distributed k-means, and the reason
  * k-means is THE clusterer at 100 TB:
  *   - assignment is a per-row argmin over a BROADCAST centroid array
  *     (K·d doubles, kilobytes) — zero shuffles, embarrassingly
  *     parallel, whole-stage codegen'd HOF arithmetic;
  *   - the update is one posexplode → (cent, pos) partial-aggregated
  *     shuffle whose reduce side is K·d rows regardless of N;
  *   - per-round state is the K×d centroid matrix alone, lineage-cut
  *     with localCheckpoint (the iterative-DataFrame guard used by
  *     [[graft.ops.GraphOps.connectedComponents]]).
  * So a round costs one map pass + one tiny-keyspace shuffle; R rounds
  * cost R of those, with no growth in state or plan depth.
  *
  * Determinism (what makes a full DuckDB oracle possible where most
  * k-means implementations are rows-only): seeds are the first K
  * vectors by id (no RNG); distances are the same left-to-right double
  * fold as the oracle's `list_sum`; argmin ties break on the lower
  * centroid id; and the mean accumulates in DecimalType(38,12) — exact
  * and order-free — so centroids are bit-identical under any
  * partitioning and reproducible by DuckDB's decimal sum. A cluster
  * that loses every member simply drops out of the next round (standard
  * Lloyd detail; both engines' GROUP BY agree).
  */
object ClusterOps extends OpModule {

  private val K = 8
  private val Rounds = 3

  /** Squared L2 between a float-array row and a double-array centroid:
    * sequential left-to-right fold, matching DuckDB's `list_sum` over
    * the zipped difference squares.
    */
  private def d2(emb: Column, cemb: Column): Column =
    aggregate(zip_with(emb, cemb,
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Collapse the (tiny) centroid table to ONE row holding the array of
    * (cent, cemb) structs — the broadcast side of the shuffle-free
    * assignment (the [[SimilarityOps]] centroid-array pattern;
    * sort_array makes the collect_list order-free).
    */
  private def centArrayRow(cents: DataFrame): DataFrame =
    cents.agg(sort_array(collect_list(struct(col("cent"), col("cemb")))).as("cl"))

  /** `rounds` Lloyd assignment passes with `rounds - 1` centroid
    * updates in between (assign → update → … → assign), returning the
    * final assignment (vec_id, embedding, cent, d2). The argmin is the
    * ascending lexicographic sort of (d2, cent) structs over the
    * broadcast centroid array — a pure map-side expression reproducing
    * `row_number() OVER (ORDER BY d2 ASC, cent ASC) = 1` exactly.
    */
  def kmeansAssign(s: SparkSession, dir: String, k: Int = K,
      rounds: Int = Rounds): DataFrame = {
    val base = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    var cents = base.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent"), col("embedding").cast("array<double>").as("cemb"))
      .localCheckpoint(true)

    def assign(c: DataFrame): DataFrame = base
      .crossJoin(broadcast(centArrayRow(c)))
      .withColumn("best", array_sort(transform(col("cl"), cc => struct(
        d2(col("embedding"), cc.getField("cemb")).as("d"),
        cc.getField("cent").as("cent")))).getItem(0))
      .select(col("vec_id"), col("embedding"),
        col("best").getField("cent").as("cent"), col("best").getField("d").as("d2"))

    for (_ <- 1 until rounds) {
      val assigned = assign(cents)
      cents = assigned
        .select(col("cent"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .groupBy("cent", "pos")
        .agg((sum(col("val").cast("double").cast(DecimalType(38, 12))).cast("double")
          / count(lit(1))).as("mean"))
        .groupBy("cent")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          x => x.getField("mean")).as("cemb"))
        .localCheckpoint(true)
    }
    assign(cents)
  }

  /** DuckDB twin: the identical assign/update chain unrolled into CTEs
    * (c0 → a1 → c1 → a2 → … → a`Rounds`), `list_sum` mirroring the
    * sequential fold and DECIMAL(38,12) mirroring the exact mean
    * accumulator. MATERIALIZED pins the reused CTEs against inlining.
    */
  private def kmeansOracleSql: String = {
    val steps = (2 to Rounds).map { i =>
      val j = i - 1
      s"""p$j AS (SELECT cent, unnest(list_transform(range(1, len(embedding) + 1),
         |         i -> {'pos': i, 'val': embedding[i]})) AS u FROM a$j),
         |c$j AS MATERIALIZED (SELECT cent, list(mean ORDER BY pos) AS cemb FROM (
         |        SELECT cent, u.pos AS pos,
         |          CAST(sum(CAST(CAST(u.val AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
         |            / count(*) AS mean
         |        FROM p$j GROUP BY cent, u.pos) GROUP BY cent),
         |s$i AS (SELECT n.vec_id, n.embedding, c.cent,
         |         list_sum(list_transform(list_zip(n.embedding, c.cemb),
         |           p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))) AS d2
         |       FROM n, c$j c),
         |a$i AS MATERIALIZED (SELECT vec_id, embedding, cent, d2 FROM (
         |         SELECT *, row_number() OVER (PARTITION BY vec_id
         |                     ORDER BY d2 ASC, cent ASC) AS rn FROM s$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT vec_id AS cent,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cemb
       |       FROM n WHERE vec_id < $K),
       |s1 AS (SELECT n.vec_id, n.embedding, c.cent,
       |         list_sum(list_transform(list_zip(n.embedding, c.cemb),
       |           p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))) AS d2
       |       FROM n, c0 c),
       |a1 AS MATERIALIZED (SELECT vec_id, embedding, cent, d2 FROM (
       |         SELECT *, row_number() OVER (PARTITION BY vec_id
       |                     ORDER BY d2 ASC, cent ASC) AS rn FROM s1) WHERE rn = 1),
       |$steps
       |SELECT vec_id, cent, round(d2, 9) AS d2 FROM a$Rounds ORDER BY vec_id""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    // nn9 — iterative k-means fit: 3 Lloyd assignment passes, 2 exact
    // decimal-mean centroid updates, deterministic id-order seeds.
    Q("nn9_kmeans_lloyd", Some(kmeansOracleSql),
      (s, dir) => kmeansAssign(s, dir)
        .select(col("vec_id"), col("cent"), round(col("d2"), 9).as("d2"))
        .orderBy("vec_id"))
  )
}
