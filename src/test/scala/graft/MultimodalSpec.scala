package graft

import graft.quality.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSuite {

  test("binary decode stub: schema, determinism, length accounting") {
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
      assert(r.getLong(1) == lens(r.getLong(0)))
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 256)
      assert(r.getDouble(4) > 0.0)
    }
    // deterministic across runs
    val again = Multimodal.decodeBinary(docs).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("resize stub halves dimensions and subsamples bytes") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val decoded = Multimodal.decodeBinary(docs)
    val resized = Multimodal.resizeStub(decoded, stride = 4).collect()
    val orig = decoded.collect().map(r => r.getLong(0) -> r).toMap
    resized.foreach { r =>
      val o = orig(r.getLong(0))
      assert(r.getInt(1) == o.getInt(2) / 2)
      assert(r.getLong(3) == o.getLong(1) / 4)
    }
  }
}
