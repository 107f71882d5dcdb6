package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The k5/k6 round-trip oracles run on the driver corpus, whose text
  * contains no quotes, commas, newlines or backslashes — so they prove
  * row fidelity but not ESCAPING. This spec feeds the same writer/reader
  * option sets a deliberately hostile corpus (embedded quotes, commas,
  * CRLF, backslashes, unicode, empty string, null) and asserts bit-exact
  * round-trips. Guards the exact failure mode called out in SinkOps:
  * Spark's default CSV escape is backslash, which self-round-trips but
  * corrupts against every RFC-4180 reader — these options must stay
  * double-quote on BOTH sides.
  */
class SinkEscapeSpec extends AnyFunSuite with SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private val hostile = Seq(
    Row(1L, "plain"),
    Row(2L, "comma, separated, values"),
    Row(3L, "a \"quoted\" word"),
    Row(4L, "quote-then-comma \", tricky"),
    Row(5L, "line\nbreak and\r\ncrlf"),
    Row(6L, "back\\slash and \\\" both"),
    Row(7L, "unicode: naïve café 日本語 🚀"),
    Row(8L, ""),
    Row(9L, null))

  private def roundTrip(fmt: String): Unit = {
    val in = spark.createDataFrame(
      spark.sparkContext.parallelize(hostile, 2), schema)
    val out = etl.ScratchDirs.keyed(s"escape_$fmt", "spec") + s"/$fmt"
    fmt match {
      case "csv" =>
        in.write.mode("overwrite")
          .option("header", "true").option("quote", "\"").option("escape", "\"")
          .csv(out)
        val back = spark.read.schema(schema)
          .option("header", "true").option("quote", "\"").option("escape", "\"")
          .option("multiLine", "true").csv(out)
        assertSame(in, back)
      case "json" =>
        in.write.mode("overwrite").json(out)
        val back = spark.read.schema(schema).json(out)
        assertSame(in, back)
    }
  }

  private def assertSame(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    val l = a.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val r = b.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(r.keySet == l.keySet, s"row set changed: ${l.keySet} vs ${r.keySet}")
    for ((k, v) <- l) {
      // CSV cannot distinguish empty string from null without a
      // sentinel (both serialize to an empty field) — Spark reads both
      // back as null; accept that one documented collapse, nothing else.
      val got = r(k)
      val ok = got == v || (v.contains("") && got.isEmpty)
      assert(ok, s"row $k mangled: ${v} -> ${got}")
    }
  }

  test("CSV round-trips hostile quoting with RFC-4180 options") { roundTrip("csv") }
  test("JSONL round-trips hostile strings bit-exactly") { roundTrip("json") }
}
