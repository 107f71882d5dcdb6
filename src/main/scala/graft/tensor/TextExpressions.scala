package graft.tensor

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial string hash — the token-code kernel of the dedup
  * sketch family (DedupOps) and the k-gram hash of winnowing (TextOps).
  *
  * Arithmetic contract (must not drift — the DuckDB oracles recompute
  * it): left-to-right Horner fold over the string's characters,
  * `acc = (acc * 127 + char) % (2^31 − 1)`, zero-seeded. Implemented
  * over UTF-8 BYTES, which equals the character fold on ASCII input (the
  * documents corpus is printable-ASCII; non-ASCII bytes would diverge
  * from a codepoint-based engine — acceptable for a hash, but the oracle
  * SQL assumes ASCII).
  *
  * Exists because the equivalent higher-order-function form
  * (`aggregate(sequence(...), ... ascii(substring(...)))`) is interpreted
  * per element — HOFs don't participate in whole-stage codegen — and
  * allocates a per-char substring; measured ~3× end-to-end on the dd
  * sketch queries at sf0.1. This is a tight primitive loop inside the
  * generated code.
  */
case class PolyHash31(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash31 requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    PolyHash31.hash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.tensor.PolyHash31.hash($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PolyHash31 {
  final val Mod = 2147483647L // 2^31 − 1
  final val Base = 127L

  /** Static kernel shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    var acc = 0L
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, offset + i) & 0xFF
      acc = (acc * Base + b) % Mod
      i += 1
    }
    acc
  }
}

object TextFunctions {
  /** Register `poly_hash31`; idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash31",
      exprs => PolyHash31(exprs.head), "built-in")
  }
}
