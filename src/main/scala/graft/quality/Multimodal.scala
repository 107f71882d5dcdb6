package graft.quality

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payload columns with typed
  * metadata, decoded partition-wise. The decode is REAL for the formats a
  * multimodal corpus actually contains — PNG and JPEG via the JVM's own
  * `javax.imageio` (no external dependency), plus the two trivial
  * containers parsed by hand, PPM (P6) images and WAV (RIFF/PCM) audio —
  * and falls back to a deterministic byte-derived pseudo-decode for
  * anything else (an MP3/MP4 codec would slot into the same dispatch).
  * The Spark-side contract is the point either way: binary column
  * ingestion, per-partition batched decode (the Scala analog of
  * `mapInPandas`), explicit output schema, and chunk accounting.
  */
object Multimodal extends OpModule {

  /** Output schema of the decoder. `width`/`height` are image dims for
    * png/jpeg/ppm, (channels, bits/sample) for wav, byte-derived
    * pseudo-dims for raw; `mean_intensity` is the mean decoded RGB
    * channel byte (png/jpeg), mean pixel byte (ppm), mean |sample| (wav),
    * or mean payload byte (raw). `pixel_fp` is an md5 over the DECODED
    * row-major RGB triplets for png/jpeg — the content identity that
    * survives lossless re-containering — and over the container bytes for
    * the other formats.
    */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false),
    StructField("pixel_fp", StringType, nullable = false)))

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Decompression-bomb guard: a 100 TB crawl WILL contain hostile
    * images, and a tiny PNG can declare gigapixel dims that only
    * materialize at decode time. Payloads declaring more pixels than
    * this are sent down the raw fallback instead of decoded (2^26 px
    * ≈ 192 MB of RGB — comfortably above real corpus images, safely
    * below executor-threatening).
    */
  val MaxDecodedPixels: Long = 1L << 26

  /** Container magic of the imageio-decoded formats: PNG's 8-byte
    * signature prefix and JPEG's SOI+marker prefix. Dispatch is gated on
    * the magic so non-image payloads never pay an ImageIO reader probe.
    */
  private[graft] def imageFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) Some("jpeg")
    else None

  /** Open an ImageIO reader on the payload, check DECLARED dims against
    * [[MaxDecodedPixels]] BEFORE decoding (the header is read without
    * materializing pixels), then hand the decoded image to `f`. None on
    * any malformation — a corrupt container falls back, never throws.
    */
  private def withDecodedImage[A](bytes: Array[Byte])
      (f: java.awt.image.BufferedImage => A): Option[A] = {
    if (imageFormat(bytes).isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodedPixels) None
          else Some(f(reader.read(0)))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real PNG/JPEG decode via `javax.imageio`: (format, width, height,
    * mean RGB channel byte, md5 over decoded row-major RGB triplets).
    * Pixels stream through one reusable row buffer — memory is O(width),
    * not O(pixels), on top of the decoded image itself.
    */
  private[graft] def parseImage(bytes: Array[Byte]): Option[(String, Int, Int, Double, String)] =
    withDecodedImage(bytes) { img =>
      val w = img.getWidth
      val h = img.getHeight
      val md = java.security.MessageDigest.getInstance("MD5")
      val row = new Array[Int](w)
      val rgb = new Array[Byte](w * 3)
      var sum = 0L
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sum += r + g + b
          rgb(x * 3) = r.toByte; rgb(x * 3 + 1) = g.toByte; rgb(x * 3 + 2) = b.toByte
          x += 1
        }
        md.update(rgb)
        y += 1
      }
      (imageFormat(bytes).get, w, h, sum.toDouble / (3.0 * w * h),
        md.digest.map("%02x".format(_)).mkString)
    }

  /** Real nearest-neighbor image resample: decode, keep every `factor`-th
    * pixel in each dimension, return the downsampled dims and the md5
    * over the resampled row-major RGB triplets. None for non-image or
    * malformed payloads, or when the image is smaller than `factor`.
    */
  private[graft] def resampleImage(bytes: Array[Byte], factor: Int): Option[(Int, Int, String)] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    withDecodedImage(bytes) { img =>
      val ow = img.getWidth / factor
      val oh = img.getHeight / factor
      if (ow <= 0 || oh <= 0) None
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val rgb = new Array[Byte](ow * 3)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val p = img.getRGB(x * factor, y * factor)
            rgb(x * 3) = ((p >> 16) & 0xff).toByte
            rgb(x * 3 + 1) = ((p >> 8) & 0xff).toByte
            rgb(x * 3 + 2) = (p & 0xff).toByte
            x += 1
          }
          md.update(rgb)
          y += 1
        }
        Some((ow, oh, md.digest.map("%02x".format(_)).mkString))
      }
    }.flatten
  }

  /** Real PPM P6 parse: `P6 <ws> width <ws> height <ws> maxval <single
    * ws> <w*h*3 raw RGB bytes>`, `#` comments allowed in the header.
    * Returns (width, height, mean over the pixel bytes), or None if the
    * container is malformed or truncated.
    */
  private[graft] def parsePpm(bytes: Array[Byte]): Option[(Int, Int, Double)] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else in = false
      }
    }
    def token(): Option[Int] = {
      skipWs()
      val start = i
      // accumulate in Long with an early bail so a malformed 10+-digit
      // header token can neither throw (toInt) nor overflow
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      if (i == start || v > Int.MaxValue) None else Some(v.toInt)
    }
    for {
      w <- token(); h <- token(); maxval <- token()
      if w > 0 && h > 0 && maxval > 0 && maxval < 65536
      // exactly ONE whitespace byte separates header from raster — and
      // it must BE whitespace: a '#' here (comment between maxval and
      // raster, which the netpbm spec permits) would otherwise be
      // swallowed and the comment text read as pixel data; such headers
      // conservatively fall back (None → raw pseudo-decode) instead of
      // silently mis-decoding
      if i < bytes.length && {
        val c = bytes(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\r'
      } && { i += 1; true }
      bytesPerSample = if (maxval < 256) 1 else 2
      // raster size in LONG — w*h*3 on declared (not actual) dims can
      // exceed Int range, and an Int wrap would fake a successful parse
      n = w.toLong * h.toLong * 3L * bytesPerSample
      if bytes.length.toLong - i >= n
    } yield {
      val end = i + n.toInt // n ≤ bytes.length here, so the cast is safe
      var sum = 0L
      var j = i
      if (bytesPerSample == 1) { while (j < end) { sum += bytes(j) & 0xff; j += 1 } }
      else { while (j < end) { sum += ((bytes(j) & 0xff) << 8) | (bytes(j + 1) & 0xff); j += 2 } }
      (w, h, sum.toDouble / (w.toLong * h * 3))
    }
  }

  /** Real WAV RIFF parse: `RIFF <size> WAVE` then chunks; reads PCM
    * format from the `fmt ` chunk (channels, bits/sample) and decodes the
    * `data` chunk — mean |sample| for 16-bit signed little-endian PCM,
    * mean unsigned byte for 8-bit. None if malformed.
    */
  private[graft] def parseWav(bytes: Array[Byte]): Option[(Int, Int, Double)] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var channels, bits = -1
    var dataOff, dataLen = -1L
    while (i >= 0 && i + 8 <= bytes.length && (channels < 0 || dataOff < 0)) {
      val id = tag(i)
      val len = u32(i + 4)
      // the fmt fields are read only if the CHUNK declares them (len>=16),
      // not merely if the file happens to have 16 more bytes — otherwise
      // channels/bits would be read out of the next chunk's header
      if (id == "fmt " && len >= 16 && i + 8 + 16 <= bytes.length) {
        channels = u16(i + 8 + 2)
        bits = u16(i + 8 + 14)
      } else if (id == "data") {
        dataOff = i + 8
        dataLen = math.min(len, bytes.length - dataOff)
      }
      // advance in LONG: 8 + len + pad can exceed Int range near a 2 GB
      // payload, and an Int wrap would send tag() out of bounds
      val next = i.toLong + 8L + len + (len & 1L)
      i = if (len > bytes.length || next > bytes.length) bytes.length else next.toInt
    }
    if (channels <= 0 || dataOff < 0 || (bits != 8 && bits != 16)) return None
    val (off, len) = (dataOff.toInt, dataLen.toInt)
    if (bits == 8) {
      if (len == 0) return Some((channels, bits, 0.0))
      var sum = 0L; var j = off
      while (j < off + len) { sum += bytes(j) & 0xff; j += 1 }
      Some((channels, bits, sum.toDouble / len))
    } else {
      val n = len / 2
      if (n == 0) return Some((channels, bits, 0.0))
      var sum = 0L; var j = off
      while (j + 1 < off + len) {
        val s = ((bytes(j) & 0xff) | (bytes(j + 1) << 8)).toShort
        sum += math.abs(s.toInt); j += 2
      }
      Some((channels, bits, sum.toDouble / n))
    }
  }

  /** Partition-wise batched decode of a binary payload column: dispatch
    * on the container magic (PNG/JPEG → `javax.imageio`, PPM `P6`, WAV
    * `RIFF…WAVE`), REAL parse for all four, deterministic byte-derived
    * pseudo-decode for everything else (`format = "raw"` — where an
    * MP3/MP4 codec would go).
    */
  def decodeBinary(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // batch the partition like an Arrow-batched decoder would
        rows.grouped(64).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            // a NULL payload is "corrupt container" too — fall back to
            // the raw pseudo-decode (empty bytes), never NPE the job
            val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
            val (fmt, w, h, mean, fp) = parseImage(bytes) match {
              case Some(img) => img
              case None => parsePpm(bytes) match {
                case Some((w, h, m)) => ("ppm", w, h, m, md5hex(bytes))
                case None => parseWav(bytes) match {
                  case Some((ch, bits, m)) => ("wav", ch, bits, m, md5hex(bytes))
                  case None =>
                    val w = (bytes.headOption.getOrElse(0: Byte) & 0xff) + 1
                    val h = (bytes.lift(1).getOrElse(0: Byte) & 0xff) + 1
                    val m = if (bytes.isEmpty) 0.0
                    else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
                    ("raw", w, h, m, md5hex(bytes))
                }
              }
            }
            Row(id, fmt, bytes.length.toLong, w, h, mean, fp)
          }
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Output schema of [[resampleImages]]. */
  val resampledSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixel_fp", StringType, nullable = false)))

  /** Real image-resize stage: nearest-neighbor downsample every PNG/JPEG
    * payload by `factor`, partition-wise. Non-image or malformed payloads
    * are DROPPED (the "resize all images" semantic is a filter+transform,
    * exactly like mm3's frame sampling); [[resizeStub]] remains the
    * metadata-level plan shape over the full decode.
    */
  def resampleImages(df: DataFrame, factor: Int): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.grouped(64).flatMap { batch =>
          batch.flatMap { r =>
            // NULL payloads drop like any other non-image (filter semantics)
            val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
            resampleImage(bytes, factor).map { case (w, h, fp) =>
              Row(r.getLong(0), imageFormat(bytes).get, w, h, fp)
            }
          }
        }
      }
    spark.createDataFrame(rdd, resampledSchema)
  }

  /** Resize / frame-sample stage over decoded metadata: halves the
    * dimensions and keeps every `stride`-th chunk — the Spark-side plan
    * shape of a media downsampling stage.
    */
  def resizeStub(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("doc_id"), col("format"),
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
