package graft.quality

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payload columns with typed
  * metadata, decoded partition-wise. The real decode (image/audio codecs)
  * is STUBBED with a deterministic fake — no media libraries exist in this
  * environment — but the Spark-side contract is real: binary column
  * ingestion, per-partition batched decode (the Scala analog of
  * `mapInPandas`), explicit output schema, and chunk accounting.
  */
object Multimodal extends OpModule {

  /** Output schema of the (stubbed) decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  /** Partition-wise batched decode of a binary payload column.
    *
    * STUB: a real implementation would hand each batch to an image/audio
    * codec; here the "decode" derives deterministic fake metadata from the
    * bytes so the plumbing (schema, batching, partitioning) is testable.
    */
  def decodeBinary(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // batch the partition like an Arrow-batched decoder would
        rows.grouped(64).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val w = (bytes.headOption.getOrElse(0: Byte) & 0xff) + 1
            val h = (bytes.lift(1).getOrElse(0: Byte) & 0xff) + 1
            val mean =
              if (bytes.isEmpty) 0.0
              else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
            Row(id, bytes.length.toLong, w, h, mean)
          }
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Resize / frame-sample stub over decoded metadata: halves the fake
    * dimensions and keeps every `stride`-th chunk — the Spark-side plan
    * shape of a media downsampling stage (the codec itself is stubbed).
    */
  def resizeStub(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("doc_id"),
      (col("width") / 2).cast("int").as("width"),
      (col("height") / 2).cast("int").as("height"),
      expr(s"payload_bytes div $stride").as("sampled_bytes"),
      col("mean_intensity"))

  /** 0..n_chunks-1 for mm2/mm3. Guarded: for empty text Spark's
    * sequence(0, -1) evaluates to the DESCENDING array [0, -1] (it would
    * emit phantom chunks), where DuckDB's range(0, 0) emits none — the
    * `when` yields null there and explode drops the row on both engines.
    */
  private val chunkIdxSeq = {
    val n = ceil(length(col("text")) / lit(256.0)).cast("long")
    when(n > 0, sequence(lit(0L), n - 1))
  }

  val qs: Seq[Q] = Seq(
    // Binary-column ingestion + chunk accounting (the SQL-checkable part;
    // the decode stub is covered by MultimodalSpec).
    Q("mm1_binary_ingest", Some(
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
        |       CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
        |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("payload_bytes"),
          ceil(length(col("payload")) / lit(256.0)).cast("long").as("n_chunks"))
        .orderBy("doc_id")),

    // Chunked payload processing (frame-sampling analog): split each
    // payload into fixed 256-byte chunks relationally and fingerprint
    // each chunk — the plan shape of per-frame feature extraction, with
    // the codec swapped for md5.
    Q("mm2_chunk_features", Some(
      """SELECT doc_id, chunk_idx, md5(substring(text, CAST(chunk_idx * 256 + 1 AS BIGINT), 256)) AS chunk_fp,
        |  CAST(length(substring(text, CAST(chunk_idx * 256 + 1 AS BIGINT), 256)) AS BIGINT) AS chunk_len
        |FROM (SELECT doc_id, text, unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS chunk_idx
        |      FROM documents)
        |ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, dir) => {
        val chunk = "substring(text, CAST(chunk_idx * 256 + 1 AS INT), 256)"
        Tables(s, dir, "documents")
          .withColumn("chunk_idx", explode(chunkIdxSeq))
          .select(col("doc_id"), col("chunk_idx"),
            md5(expr(chunk)).as("chunk_fp"),
            length(expr(chunk)).cast("long").as("chunk_len"))
          .orderBy("doc_id", "chunk_idx")
      }),

    // Frame sampling (video keyframe analog): keep every 4th chunk of the
    // payload — the strided-selection plan shape of media frame sampling,
    // with the codec swapped for a fingerprint. The stride filter prunes
    // BEFORE the expensive per-chunk work, exactly where a real decoder
    // wants it.
    Q("mm3_frame_sample", Some(
      """SELECT doc_id, chunk_idx, md5(substring(text, CAST(chunk_idx * 256 + 1 AS BIGINT), 256)) AS frame_fp
        |FROM (SELECT doc_id, text, unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT))) AS chunk_idx
        |      FROM documents)
        |WHERE chunk_idx % 4 = 0
        |ORDER BY doc_id, chunk_idx""".stripMargin),
      (s, dir) => {
        val chunk = "substring(text, CAST(chunk_idx * 256 + 1 AS INT), 256)"
        Tables(s, dir, "documents")
          .withColumn("chunk_idx", explode(chunkIdxSeq))
          .filter(col("chunk_idx") % 4 === 0)
          .select(col("doc_id"), col("chunk_idx"), md5(expr(chunk)).as("frame_fp"))
          .orderBy("doc_id", "chunk_idx")
      })
  )
}
