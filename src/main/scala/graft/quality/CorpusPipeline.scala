package graft.quality

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning — the composition every LLM data
  * pipeline runs, expressed as ONE Catalyst plan over the library's own
  * operators:
  *
  *   near-dup cluster dedup (dd6: MinHash → cliques → rep-graph CC)
  *   → keep one survivor per cluster (its minimum doc id)
  *   → language filter (lang = 'en')
  *   → quality filter (x2's score ≥ 0.65)
  *   → per-source corpus accounting (docs, tokens).
  *
  * Dedup runs on the FULL corpus before the filters — the standard order
  * (a near-dup of a kept doc must not re-enter via a different lang tag
  * or a marginally different quality score); a cluster whose
  * representative fails the filters is dropped entirely, by design.
  *
  * Fully oracled: the SQL composes the dd6 recursive-CTE cluster oracle
  * with x1/x2's token and quality arithmetic — DuckDB replays the whole
  * pipeline, dedup included.
  */
object CorpusPipeline extends OpModule {

  private val MinEstJaccard = 0.95
  private val MinQuality = 0.65

  private def oracleSql: String =
    s"""WITH RECURSIVE ${DedupOps.minhashCtes},
       |${DedupOps.estSql(2)},
       |edges AS (SELECT a, b FROM t2 WHERE est_jaccard >= $MinEstJaccard),
       |sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
       |reach(id, r) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT s.b, r.r FROM reach r JOIN sym s ON s.a = r.id),
       |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       |members AS (SELECT ids[1] AS rep, u.m AS doc_id FROM cl, unnest(ids) u(m)),
       |clusters AS (SELECT m.doc_id, coalesce(c.comp, m.rep) AS cluster_rep
       |             FROM members m LEFT JOIN comp c ON c.id = m.rep),
       |survivors AS (SELECT doc_id FROM clusters WHERE doc_id = cluster_rep),
       |scored AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    ${TextOps.QualitySql} AS quality
       |  FROM documents WHERE lang = 'en')
       |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |FROM scored JOIN survivors USING (doc_id)
       |WHERE quality >= $MinQuality
       |GROUP BY source ORDER BY source""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("pipe1_clean_corpus", Some(oracleSql), (s, dir) => {
      val survivors = DedupOps.dedupClusters(s, dir, MinEstJaccard)
        .filter(col("doc_id") === col("cluster_rep"))
        .select("doc_id")
      val scored = Tables(s, dir, "documents")
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
          TextOps.qualityScore(col("text")).as("quality"))
      scored.join(survivors, "doc_id")
        .filter(col("quality") >= MinQuality)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("source")
    })
  )
}
