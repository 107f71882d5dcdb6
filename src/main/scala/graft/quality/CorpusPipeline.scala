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
    }),

    // pipe2 — the TRAINING-PREP half of the pipeline, downstream of
    // cleaning: exact dedup (content md5, first-occurrence keeper) →
    // quality gate (x2's score ≥ 0.63, ~60% pass on the synthetic
    // corpus at every SF) → x19 sliding-window chunking (128/64) →
    // x8's hash-threshold split assignment → per-split shard
    // accounting (docs, chunks, tokens). One Catalyst plan end-to-end:
    // a window keyed on the content hash, map-side scoring/chunking
    // (one Generate), and a single final aggregation — nothing
    // driver-side. Split assignment reuses x8's exact md5 fold, so a
    // doc's split here matches its x8 split (the consistency a real
    // pipeline needs between its split audit and its shard writer).
    Q("pipe2_training_chunks", Some(
      s"""WITH keep AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text,
         |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM documents) WHERE rn = 1),
         |q AS (SELECT doc_id, text FROM keep WHERE ${TextOps.QualitySql} >= 0.63),
         |s AS (SELECT doc_id,
         |        CASE WHEN substr(md5(concat_ws('|', doc_id, 'split/42')), 1, 8) < 'cccccccc' THEN 'train'
         |             WHEN substr(md5(concat_ws('|', doc_id, 'split/42')), 1, 8) < 'e6666666' THEN 'val'
         |             ELSE 'test' END AS split,
         |        len(regexp_split_to_array(trim(text), '\\s+')) AS n
         |      FROM q),
         |e AS (SELECT split, doc_id, n,
         |        CASE WHEN n <= 128 THEN 1 ELSE (n - 128 + 63) // 64 + 1 END AS k FROM s),
         |x AS (SELECT split, doc_id, n, unnest(generate_series(0, k - 1)) AS i FROM e)
         |SELECT split, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  count(*) AS n_chunks, CAST(sum(least(n - i * 64, 128)) AS BIGINT) AS n_tokens
         |FROM x GROUP BY split ORDER BY split""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text"))).orderBy("doc_id")
        val h = substring(md5(concat_ws("|", col("doc_id"), lit("split/42"))), 1, 8)
        Tables(s, dir, "documents")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .filter(TextOps.qualityScore(col("text")) >= 0.63)
          .select(col("doc_id"),
            when(h < "cccccccc", "train").when(h < "e6666666", "val")
              .otherwise("test").as("split"),
            size(split(trim(col("text")), "\\s+")).as("n"))
          .withColumn("k", when(col("n") <= 128, lit(1))
            .otherwise(expr("(n - 128 + 63) div 64 + 1")))
          .withColumn("i", explode(sequence(lit(0), col("k") - 1)))
          .groupBy("split")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum(least(col("n") - col("i") * 64, lit(128)).cast("long")).as("n_tokens"))
          .orderBy("split")
      })
  )
}
