package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native squared-L2 distance over two numeric array columns (each
  * `array<float>` or `array<double>`), with strict left-to-right double
  * accumulation of (xᵢ − yᵢ)².
  *
  * Same rationale and bit-compatibility contract as [[VectorDot]]: the
  * HOF formulation (`zip_with` diff-square + `aggregate` sum) is
  * CodegenFallback — interpreted, boxed per element — and sat on the
  * k-means assignment hot path (every vector × every centroid, three
  * passes per training run). This is one fused primitive loop in
  * whole-stage codegen, and the operation order (widen, subtract,
  * square, accumulate left-to-right) is EXACTLY the HOF's and the DuckDB
  * oracle's `list_sum(list_transform(list_zip(...)))`, so swapping it in
  * changes no result bit (TextVectorSpec asserts native == HOF).
  * Inputs are assumed equal-length with non-null elements (the
  * embeddings/centroid contract); a LENGTH MISMATCH returns NULL —
  * exactly what the HOF yields there (zip_with null-pads the shorter
  * array, the null element nulls the aggregate sum), so native == HOF
  * holds unconditionally and a ragged-array caller gets an honest null,
  * never a plausible-but-wrong prefix distance.
  */
case class VectorL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_l2sq"
  // null on length mismatch, independent of child nullability
  override def nullable: Boolean = true

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = get(x, i, lt) - get(y, i, rt)
        acc += d * d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(a: String, i: String, t: DataType) = t match {
      case FloatType => s"(double) $a.getFloat($i)"
      case _ => s"$a.getDouble($i)"
    }
    val (lt, rt) = (elemType(left.dataType).get, elemType(right.dataType).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${getter(a, i, lt)} - ${getter(b, i, rt)};
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2Sq =
    copy(left = newLeft, right = newRight)
}
