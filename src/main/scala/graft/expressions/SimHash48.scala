package graft.expressions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 48-bit SimHash over an `array<string>` feature column (word
  * shingles), semantically identical to the layered HOF formulation in
  * [[graft.functions.TextFunctions]] (md5 per feature → 12 hex nibbles →
  * 48 signed bit sums → sign bits) and to the DuckDB oracle's
  * instr-nibble arithmetic, bit for bit.
  *
  * Why a custom Expression (builder-brief preference (b)): the HOF
  * version needs 12 `transform` + 48 `aggregate` traversals per row, all
  * CodegenFallback — interpreted, one boxed lambda call per element per
  * traversal — and its 48-term CASE-WHEN assembly alone costs seconds of
  * janino compilation on first use. Here the whole signature is one
  * primitive JVM loop per row (one md5 per feature, branch-free nibble
  * math), participating in whole-stage codegen via a static call.
  *
  * Null contract: null input array → null; null ELEMENTS are skipped
  * (treated as absent features — the operator pipeline never produces
  * them, concat_ws over tokenized text is null-free, but a library
  * caller must not crash the task). Empty array → all 48 sums are 0 ≥ 0
  * → all bits set, matching the Spark HOF formulation (aggregate's 0L
  * init). NB the DuckDB mirror arithmetic differs on THIS edge only:
  * list_sum of an empty list is NULL there, giving 0 — the bit-for-bit
  * oracle contract covers non-empty feature sets, which shinglesOf
  * guarantees (≥1 shingle for any document, even empty text).
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash48.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.SimHash48.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object SimHash48 {
  val Bits = 48

  /** One pass: md5 each element, read hex nibble j = digest byte j/2
    * (high nibble for even j), accumulate ((v >> b%4) & 1) * 2 - 1 into
    * sums[b] for b = 4j .. 4j+3, then set bit b iff sums[b] >= 0. */
  def compute(arr: ArrayData): Long = {
    val sums = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null features are skipped, not a crash
        val digest = DigestUtils.md5(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < Bits / 4) {
          val b = digest(j / 2) & 0xff
          val v = if (j % 2 == 0) b >>> 4 else b & 0xf
          var k = 0
          while (k < 4) {
            sums(j * 4 + k) += ((v >>> k) & 1) * 2 - 1
            k += 1
          }
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (sums(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
