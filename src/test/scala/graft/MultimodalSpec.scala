package graft

import graft.quality.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {

  test("binary decode: schema, determinism, length accounting (raw fallback path)") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val decoded = Multimodal.decodeBinary(docs)
    assert(decoded.schema == Multimodal.decodedSchema)
    val rows = decoded.collect()
    assert(rows.length == docs.count())
    // payload_bytes must equal the text length (ascii corpus)
    val lens = Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getString(1) == "raw") // text payloads are neither ppm nor wav
      assert(r.getLong(2) == lens(r.getLong(0)))
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 256)
      assert(r.getDouble(5) > 0.0)
    }
    // deterministic across runs
    val again = Multimodal.decodeBinary(docs).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  /** A 2×2 P6 image with a comment and known pixel bytes. */
  private def ppmFixture: (Array[Byte], Double) = {
    val pixels = Array[Int](
      10, 20, 30, 40, 50, 60,
      70, 80, 90, 100, 110, 120).map(_.toByte)
    val header = "P6\n# test image\n2 2\n255\n".getBytes("US-ASCII")
    (header ++ pixels.map(_.toByte), (10 to 120 by 10).sum / 12.0)
  }

  /** A minimal 16-bit mono PCM WAV with known samples. */
  private def wavFixture: (Array[Byte], Double) = {
    val samples = Array[Short](100, -200, 300, -400)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)            // PCM
    bb.putShort(1)            // channels
    bb.putInt(8000)           // sample rate
    bb.putInt(16000)          // byte rate
    bb.putShort(2)            // block align
    bb.putShort(16)           // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    (bb.array(), (100 + 200 + 300 + 400) / 4.0)
  }

  test("PPM P6 and WAV RIFF containers are REALLY decoded, not stubbed") {
    import spark.implicits._
    val (ppm, ppmMean) = ppmFixture
    val (wav, wavMean) = wavFixture
    val df = Seq((1L, ppm), (2L, wav), (3L, "not a container".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeBinary(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(3), r.getInt(4), r.getDouble(5)))).toMap
    assert(got(1L) == (("ppm", 2, 2, ppmMean)))      // real header + pixel mean
    assert(got(2L) == (("wav", 1, 16, wavMean)))     // channels, bits, mean |sample|
    assert(got(3L)._1 == "raw")                      // fallback path intact
    // direct parser checks: comments, truncation, malformation
    assert(Multimodal.parsePpm(ppm).contains((2, 2, ppmMean)))
    assert(Multimodal.parsePpm(ppm.dropRight(1)).isEmpty)  // truncated raster
    assert(Multimodal.parseWav(wav).contains((1, 16, wavMean)))
    assert(Multimodal.parseWav(wav.take(40)).isEmpty)      // truncated header
    assert(Multimodal.parsePpm("P6 garbage".getBytes("US-ASCII")).isEmpty)
  }

  test("resize stage halves dimensions and subsamples bytes") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val decoded = Multimodal.decodeBinary(docs)
    val resized = Multimodal.resizeStub(decoded, stride = 4).collect()
    val orig = decoded.collect().map(r => r.getLong(0) -> r).toMap
    resized.foreach { r =>
      val o = orig(r.getLong(0))
      assert(r.getInt(2) == o.getInt(3) / 2)
      assert(r.getLong(4) == o.getLong(2) / 4)
    }
  }
}
