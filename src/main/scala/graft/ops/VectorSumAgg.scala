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
  * The buffer holds each component as a SCALED LONG: the input float is
  * widened to double and rounded to 8 decimal places exactly the way
  * Spark's `cast(DecimalType(28,8))` rounds it
  * (`BigDecimal.valueOf(double)` = canonical string, HALF_UP). Long
  * addition is exact and order-free, so the result is bit-reproducible
  * under ANY shuffle/merge order and equals the relational decimal
  * pipeline of a8_vector_sum — which is what lets this query share a8's
  * DuckDB oracle. (A double-accumulating buffer was rows-only: double
  * addition is order-sensitive in the last ulp, and the merge order is
  * nondeterministic.) Magnitude: |v| ≤ ~10 scaled to ~1e9, ~1e5 rows per
  * group at sf1 → ~1e14, eight orders below Long overflow; sf would need
  * to grow ~10^4× before the scaled sum approaches 2^63.
  */
object VectorSumAggImpl extends Aggregator[Array[Float], Array[Long], Array[Double]] {
  private val Scale = 8

  private def scaled(v: Float): Long =
    java.math.BigDecimal.valueOf(v.toDouble)
      .setScale(Scale, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def zero: Array[Long] = Array.empty
  // RAGGED groups are legal (the relational twin a8 sums per-(label,pos)
  // over whatever arrays carry that position, and the shared oracle does
  // the same): the buffer grows to the longest array seen, with absent
  // positions contributing nothing — padding with 0 is exactly the
  // per-position sum semantics. A fixed-length assumption here would
  // throw (or silently diverge from the oracle) on the first
  // non-uniform embedding column.
  private def grown(b: Array[Long], n: Int): Array[Long] =
    if (b.length >= n) b else java.util.Arrays.copyOf(b, n)
  def reduce(b: Array[Long], a: Array[Float]): Array[Long] = {
    if (a == null) return b
    val out = grown(b, a.length)
    var i = 0
    while (i < a.length) { out(i) += scaled(a(i)); i += 1 }
    out
  }
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val out = grown(x, y.length)
    var i = 0
    while (i < y.length) { out(i) += y(i); i += 1 }
    out
  }
  def finish(r: Array[Long]): Array[Double] =
    // valueOf(unscaled, scale) → doubleValue is a SINGLE correctly-rounded
    // decimal→double conversion, the same arithmetic as Spark's
    // cast(decimal as double) and DuckDB's CAST(DECIMAL AS DOUBLE).
    r.map(l => java.math.BigDecimal.valueOf(l, Scale).doubleValue())
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object VectorSumAgg extends OpModule {
  val qs: Seq[Q] = Seq(
    // Long-form output (label, pos, sv): the aggregation buffer stays one
    // dense array per group (the UDAF's whole point); only the final
    // projection explodes — the driver's pandas compare cannot hash
    // array-valued cells. Decimal-exact accumulation (see above) makes the
    // result identical to the relational a8_vector_sum, so the same
    // oracle SQL applies verbatim.
    Q("a8b_vector_sum_typed", Some(
      """SELECT label, CAST(pos AS BIGINT) AS pos,
        |       CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,8))) AS DOUBLE) AS sv
        |FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
        |             unnest(embedding) AS v FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin),
      (s, dir) =>
      Tables(s, dir, "embeddings")
        .groupBy("label")
        .agg(udaf(VectorSumAggImpl).apply(col("embedding")).as("vecsum"))
        .select(col("label"), posexplode(col("vecsum")))
        .select(col("label"), col("pos").cast("long").as("pos"), col("col").as("sv"))
        .orderBy("label", "pos"))
  )
}
