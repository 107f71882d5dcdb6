package graft.etl

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.functions._

/** K-path sinks (SURVEY.md §2.2 K1/K2): compressed, partitioned parquet
  * export with a driver-oracled read-back audit.
  *
  * The reference's entire output path is a parquet write
  * (`dlmerged2parquet.py:289-291`); until round 4 the K1/K2 sinks were
  * only spec-verified (SourcesSpec, PipelineDemo, TrainingPrepSpec). This
  * query makes the write itself driver-gated: export `documents`
  * partitioned by `lang` with gzip compression to a fresh temp dir, read
  * it back, and emit one row per partition key carrying a count, id/char
  * sums, and an order-free content fingerprint (min/max of a per-row md5
  * over every non-partition column). DuckDB recomputes the identical
  * digests from the SOURCE table, so a row dropped, duplicated, or
  * corrupted anywhere in the write→read round trip — including a mangled
  * partition value — breaks the hash match.
  *
  * Scale shape: the export is a single shuffle-free pass (`partitionBy`
  * fans files out per key inside each task — no exchange), and the audit
  * is one map-side-partial aggregation onto a handful of language keys.
  * Nothing is driver-bound; at 100 TB the write parallelism is the scan
  * parallelism.
  */
object SinkOps extends OpModule {

  /** Per-row digest over all non-partition columns — identical text on
    * both engines (concat_ws casts the numeric columns to decimal strings
    * the same way in Spark and DuckDB).
    */
  private val rowFp = "md5(concat_ws('|', doc_id, source, n_chars, text))"

  val qs: Seq[Q] = Seq(
    Q("k1_export_roundtrip", Some(
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
         |  CAST(sum(length(text)) AS BIGINT) AS chars_sum,
         |  min($rowFp) AS fp_min, max($rowFp) AS fp_max
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      (s, dir) => {
        // fixed hardened export dir per source sfDir (see [[ScratchDirs]]
        // for the keying and symlink/ownership rationale)
        val out = ScratchDirs.keyed("k1_export", dir)
        Tables(s, dir, "documents")
          .write.mode("overwrite").partitionBy("lang")
          .option("compression", "gzip").parquet(out)
        s.read.parquet(out)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("doc_id").as("id_sum"),
            sum(length(col("text")).cast("long")).as("chars_sum"),
            min(expr(rowFp)).as("fp_min"),
            max(expr(rowFp)).as("fp_max"))
          .orderBy("lang")
      })
  )
}
