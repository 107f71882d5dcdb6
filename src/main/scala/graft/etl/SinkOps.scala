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
        // one FIXED export dir per source sfDir, overwritten each run — a
        // fresh createTempDirectory here would leak a full compressed
        // corpus copy into /tmp on every Verify/Bench execution. The path
        // is keyed on an md5 of the ABSOLUTE source path (hashCode could
        // collide two sfDirs into one silently-shared dir) and lives under
        // a per-user 0700 subdirectory (a predictable world-shared /tmp
        // name is symlink-squattable on multi-user hosts). Two JVMs
        // verifying the SAME sfDir concurrently still share the dir — an
        // accepted trade for not leaking a corpus copy per run.
        val abs = new java.io.File(dir).getAbsolutePath
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        val userRoot = new java.io.File(System.getProperty("java.io.tmpdir"),
          s"graft_${System.getProperty("user.name")}").toPath
        // The predictable name must not be FOLLOWED if an attacker planted
        // something there first: refuse a symlink (mkdirs/chmod would
        // dereference it and export through the attacker's target) and a
        // directory owned by someone else; only then create/chmod 0700.
        require(!java.nio.file.Files.isSymbolicLink(userRoot),
          s"$userRoot is a symlink — refusing to export through it")
        java.nio.file.Files.createDirectories(userRoot)
        val owner = java.nio.file.Files.getOwner(userRoot,
          java.nio.file.LinkOption.NOFOLLOW_LINKS).getName
        require(owner == System.getProperty("user.name"),
          s"$userRoot is owned by $owner, not the current user — refusing to export")
        try {
          import java.nio.file.attribute.PosixFilePermissions
          java.nio.file.Files.setPosixFilePermissions(userRoot,
            PosixFilePermissions.fromString("rwx------"))
        } catch { case _: UnsupportedOperationException => () } // non-POSIX FS
        val out = new java.io.File(userRoot.toFile, s"k1_export_$digest").getAbsolutePath
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
