package graft.expressions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native banded MinHash over an `array<string>` shingle column: k
  * salted-md5 signature components (component i = min over shingles of
  * hex md5 of "i:" + shingle; hex-string min = byte-lexicographic, the
  * cross-engine-stable order) grouped into k/r bands of r, each band
  * value the hex md5 of its components joined with "|". Bit-identical
  * to the layered HOF formulation in
  * [[graft.functions.TextFunctions.minhashBands]] (kept for the
  * differential spec) and to the DuckDB oracle.
  *
  * Why a custom Expression (same rationale as [[SimHash48]]): the HOF
  * version runs k interpreted `transform` traversals + k `array_min`
  * reductions per row — one boxed lambda call and one md5 Expression
  * evaluation per (component, shingle) — and materializes k intermediate
  * arrays. Here the whole signature is one primitive loop (k digests
  * per shingle, tracked mins, no intermediate allocation) participating
  * in whole-stage codegen via a static call.
  *
  * Null contract: null input array → NULL. NB this deliberately
  * DIVERGES from the HOF layering on that one edge (there, array_min of
  * a null array nulls each component but concat_ws skips nulls, so a
  * NULL input quirkily yields md5("") bands) — a library caller gets an
  * honest NULL, and the operators never produce a null shingle array
  * (tokens() of non-null text). Null ELEMENTS are skipped (absent
  * features); a feature-less (empty) input yields md5("") per band,
  * which DOES match the HOF. The differential spec asserts native==HOF
  * null-safely on real documents and pins the NULL-input divergence
  * explicitly.
  */
case class MinHashBands(child: Expression, k: Int, bandSize: Int)
    extends UnaryExpression {

  require(k > 0 && bandSize > 0 && k % bandSize == 0,
    "k must be a positive multiple of bandSize")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], k, bandSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.expressions.MinHashBands.compute($a, $k, $bandSize)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  // Salt prefixes are a pure function of k: cached across rows (they
  // were re-derived per row — round-3 ADVICE). k is a query constant,
  // so the map holds one entry per distinct k ever used in the JVM.
  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()
  private def saltsFor(k: Int): Array[Array[Byte]] =
    saltCache.computeIfAbsent(k,
      (kk: Integer) => Array.tabulate(kk)(c => (c + ":").getBytes("UTF-8")))

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def compute(arr: ArrayData, k: Int, r: Int): ArrayData = {
    // The O(k·n) digest loop runs allocation-free: one thread-local
    // MessageDigest, digests written into a reused 16-byte scratch,
    // running mins compared as unsigned byte arrays (hex encoding is
    // per-nibble order-preserving, so this is bit-identical to the hex
    // -string compare the HOF layering and the oracle use). A copy is
    // taken only when a new min wins (O(k·log n) expected); the k
    // winners are hex-encoded once, at band-assembly time.
    val md = mdLocal.get()
    val salts = saltsFor(k)
    val mins = new Array[Array[Byte]](k)
    val scratch = new Array[Byte](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null features are skipped, not a crash
        val sBytes = arr.getUTF8String(i).getBytes
        var c = 0
        while (c < k) {
          md.reset()
          md.update(salts(c))
          md.update(sBytes)
          md.digest(scratch, 0, 16)
          if (mins(c) == null ||
              java.util.Arrays.compareUnsigned(scratch, mins(c)) < 0)
            mins(c) = scratch.clone()
          c += 1
        }
      }
      i += 1
    }
    val bands = new Array[AnyRef](k / r)
    var j = 0
    while (j < k / r) {
      // concat_ws semantics: null components (feature-less input) skip
      val joined = mins.slice(j * r, (j + 1) * r).filter(_ != null)
        .map(org.apache.commons.codec.binary.Hex.encodeHexString)
        .mkString("|")
      bands(j) = UTF8String.fromString(DigestUtils.md5Hex(
        joined.getBytes("UTF-8")))
      j += 1
    }
    new GenericArrayData(bands)
  }
}
