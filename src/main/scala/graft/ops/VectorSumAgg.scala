package graft.ops

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, posexplode, udaf}
import org.apache.spark.sql.Encoder

/** Typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §2.12): element-wise vector
  * sum — the torch_scatter analog (A8,
  * /root/reference/larennet/larennet.py:61) as a single-pass UDAF. Both
  * reduce and merge are associative, so Spark runs it with map-side
  * partial aggregation and shuffles only the per-group partial buffers —
  * no explode, the shape that scales to wide fleets.
  *
  * Double accumulation across an arbitrary merge order is not
  * bit-reproducible against a sequential oracle, so the query is declared
  * rows-only; the relational decimal-exact twin a8_vector_sum carries the
  * oracle, and VectorAggSpec pins the two within 1e-6.
  */
object VectorSumAggImpl extends Aggregator[Array[Float], Array[Double], Array[Double]] {
  def zero: Array[Double] = Array.empty
  def reduce(b: Array[Double], a: Array[Float]): Array[Double] = {
    if (a == null) return b
    val out = if (b.length == 0) new Array[Double](a.length) else b
    var i = 0
    while (i < a.length) { out(i) += a(i); i += 1 }
    out
  }
  def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    if (x.length == 0) return y
    if (y.length == 0) return x
    var i = 0
    while (i < y.length) { x(i) += y(i); i += 1 }
    x
  }
  def finish(r: Array[Double]): Array[Double] = r
  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object VectorSumAgg extends OpModule {
  val qs: Seq[Q] = Seq(
    // Long-form output (label, pos, sv): the aggregation buffer stays one
    // dense array per group (the UDAF's whole point); only the final
    // projection explodes — the driver's pandas compare cannot hash
    // array-valued cells.
    Q("a8b_vector_sum_typed", None, (s, dir) =>
      Tables(s, dir, "embeddings")
        .groupBy("label")
        .agg(udaf(VectorSumAggImpl).apply(col("embedding")).as("vecsum"))
        .select(col("label"), posexplode(col("vecsum")))
        .select(col("label"), col("pos").cast("long").as("pos"), col("col").as("sv"))
        .orderBy("label", "pos"))
  )
}
