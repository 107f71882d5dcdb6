package graft.tensor

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the reference's ragged-tensor encoding:
  * a logical N-d tensor stored as a flattened 1-D array column plus a
  * sibling `_shape` array column (/root/reference/dlmerged2parquet.py:271-279,
  * decode at readparquet.py:25-31). These are the only genuinely custom
  * pieces of the engine (SURVEY.md §2.12); everything else is built-ins.
  *
  * They are registered as SQL functions (`tensor_explode`,
  * `tensor_reshape`) via [[TensorFunctions.register]].
  */

/** `tensor_explode(data, shape)` — emit one row `(idx, slice)` per
  * first-axis slice of the tensor: the relational inverse of the
  * flatten+shape encoding, converting per-cell tensors into long-form
  * rows that joins/filters/aggregations can address positionally.
  *
  * `slice` keeps the remaining axes flattened (its logical shape is
  * `shape[1:]`), so nested explodes recover deeper axes.
  */
case class TensorExplode(data: Expression, shape: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(data, shape)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (data.dataType, shape.dataType) match {
      case (ArrayType(_, _), ArrayType(LongType | IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tensor_explode requires (array<T>, array<long>), got " +
            s"(${data.dataType.simpleString}, ${shape.dataType.simpleString})")
    }
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("slice", data.dataType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = data.eval(input).asInstanceOf[ArrayData]
    val shp = shape.eval(input).asInstanceOf[ArrayData]
    if (arr == null || shp == null || shp.numElements() == 0) return Iterator.empty
    val elemType = data.dataType.asInstanceOf[ArrayType].elementType
    val dims: Array[Long] = shp.toLongArray()
    val n = dims(0).toInt
    val stride = if (dims.length > 1) dims.drop(1).product.toInt else 1
    require(arr.numElements() == n * stride,
      s"tensor_explode: data length ${arr.numElements()} != shape product ${n * stride}")
    val elems = arr.toObjectArray(elemType)
    Iterator.tabulate(n) { i =>
      val slice = java.util.Arrays.copyOfRange(elems, i * stride, (i + 1) * stride)
      InternalRow(i, new GenericArrayData(slice))
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(data = newChildren(0), shape = newChildren(1))
}

/** `tensor_reshape(data, shape)` — reshape a flattened tensor into nested
  * arrays (row-major), matching the reference's full-shape decode
  * (`np.array(d).reshape(shape)`, readparquet.py:25-31).
  *
  * Two forms:
  *  - `tensor_reshape(data, ncols)` — 2-D convenience: nest into rows of
  *    `ncols` (the trailing axis). `ncols` may vary per row.
  *  - `tensor_reshape(data, array(d0, d1, ..., dn))` — rank-N: the shape
  *    vector must be FOLDABLE (a literal), because the output's nesting
  *    depth is part of the static Catalyst type. Per-row dynamic shapes
  *    with a fixed leading axis are served by `tensor_explode`, which
  *    accepts a shape column.
  *
  * Pure metadata + validation; no data movement beyond the nesting.
  */
case class TensorReshape(data: Expression, shape: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(data, shape)
  override def nullable: Boolean = true

  /** Static shape vector when the rank-N form is used (foldable array). */
  private lazy val staticDims: Option[Array[Long]] = shape.dataType match {
    case ArrayType(_, _) if shape.foldable =>
      Option(shape.eval().asInstanceOf[ArrayData]).map { ad =>
        shape.dataType.asInstanceOf[ArrayType].elementType match {
          case LongType => ad.toLongArray()
          case _ => ad.toIntArray().map(_.toLong)
        }
      }
    case _ => None
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (data.dataType, shape.dataType) match {
      case (ArrayType(_, _), IntegerType | LongType) => TypeCheckSuccess
      case (ArrayType(_, _), ArrayType(IntegerType | LongType, _)) =>
        if (!shape.foldable)
          TypeCheckFailure("tensor_reshape: a shape VECTOR must be foldable " +
            "(the nesting depth is part of the static type); use tensor_explode " +
            "for per-row dynamic shapes")
        else if (staticDims.exists(d => d.isEmpty || d.exists(_ <= 0)))
          TypeCheckFailure(s"tensor_reshape: invalid shape ${staticDims.get.mkString("[", ",", "]")}")
        else TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"tensor_reshape requires (array<T>, integral | array<integral>), got " +
          s"(${data.dataType.simpleString}, ${shape.dataType.simpleString})")
    }
  }

  override def dataType: DataType = staticDims match {
    // rank-N: nesting depth == rank (data is already depth 1)
    case Some(dims) =>
      (1 until dims.length).foldLeft(data.dataType)((t, _) => ArrayType(t, containsNull = true))
    case None => ArrayType(data.dataType, containsNull = true)
  }

  private def nest(elems: Array[AnyRef], dims: Array[Long]): Any =
    if (dims.length == 1) new GenericArrayData(elems)
    else {
      val stride = dims.drop(1).product.toInt
      new GenericArrayData(
        elems.grouped(stride).map(g => nest(g, dims.tail)).toArray)
    }

  override def eval(input: InternalRow): Any = {
    val arr = data.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return null
    val elemType = data.dataType.asInstanceOf[ArrayType].elementType
    val elems = arr.toObjectArray(elemType).asInstanceOf[Array[AnyRef]]
    staticDims match {
      case Some(dims) =>
        require(arr.numElements() == dims.product,
          s"tensor_reshape: data length ${arr.numElements()} != " +
            s"shape product ${dims.product} for ${dims.mkString("[", ",", "]")}")
        if (dims.length == 1) arr else nest(elems, dims)
      case None =>
        val k = shape.eval(input) match {
          case i: Int => i
          case l: Long => l.toInt
          case null => return null
        }
        require(k > 0 && arr.numElements() % k == 0,
          s"tensor_reshape: length ${arr.numElements()} not divisible by $k")
        new GenericArrayData(elems.grouped(k).map(g => new GenericArrayData(g)).toArray)
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(data = newChildren(0), shape = newChildren(1))
}

object TensorFunctions {
  /** Register the tensor SQL functions on a session; idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("tensor_explode",
      exprs => TensorExplode(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("tensor_reshape",
      exprs => TensorReshape(exprs(0), exprs(1)), "built-in")
  }

  /** Built-in-composed equivalent of tensor_explode for 2-D tensors:
    * `posexplode` over `slice`s — used to cross-check the native
    * Generator and as the fallback where the custom fn isn't registered.
    */
  def explodeSql(dataCol: String, shapeCol: String): String = {
    val stride = s"CAST(aggregate(slice($shapeCol, 2, size($shapeCol) - 1), 1L, (a, x) -> a * x) AS INT)"
    s"posexplode(transform(sequence(0, CAST(element_at($shapeCol, 1) AS INT) - 1), " +
      s"i -> slice($dataCol, i * $stride + 1, $stride)))"
  }
}
