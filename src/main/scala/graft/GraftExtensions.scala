package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions._

/** Library Catalyst extensions — register with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * `builder.withExtensions(new GraftExtensions)`); [[Engine.session]]
  * does it by default.
  *
  * Two surfaces:
  *
  *  - the [[graft.plans.SplitMultiDistinctAggregate]] optimizer rule,
  *    injected in the operator-optimization batch (BEFORE the stock
  *    `RewriteDistinctAggregates` can Expand a multi-distinct
  *    Aggregate);
  *  - the native codegen'd expressions as SQL FUNCTIONS (`graft_`
  *    prefix, so no current or future builtin is shadowed), making the
  *    DataFrame operators' exact kernels available to verbatim-SQL
  *    users: `graft_nfc`, `graft_vector_dot`, `graft_vector_l2sq`,
  *    `graft_simhash48`, `graft_lsh_signature(vec, planes, dims)`,
  *    `graft_minhash_bands(shingles, k, band_size)`, and the bounded
  *    aggregate `graft_bounded_collect_set(col, max)` (NULL on
  *    overflow — the LSH bucket-cap contract). Shape arguments must be
  *    integer literals: they size codegen'd loops and aggregation
  *    buffers at PLAN time, exactly like the DataFrame API's Int
  *    parameters.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.SplitMultiDistinctAggregate)
    fns.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
          usage, ""),
        builder))
    }
  }
}

object GraftExtensions {
  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    // any foldable INT expression (e.g. `2 + 2`, a named constant) is
    // just as plan-time-constant as a bare literal — evaluate it now
    case f if f.foldable && f.dataType == org.apache.spark.sql.types.IntegerType =>
      f.eval() match {
        case v: Int => v
        case null => throw new IllegalArgumentException(
          s"$what must not be NULL (it sizes the codegen'd kernel at plan time)")
      }
    case other => throw new IllegalArgumentException(
      s"$what must be an INT literal (it sizes the codegen'd kernel at plan time), got $other")
  }

  private def arity(args: Seq[Expression], n: Int, name: String): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${args.length}")

  /** (name, usage, builder) for every injected function. */
  private[graft] val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_nfc",
      "graft_nfc(str) - Unicode NFC normalization (codegen'd; identity fast path).",
      args => { arity(args, 1, "graft_nfc"); NfcNormalize(args.head) }),
    ("graft_vector_dot",
      "graft_vector_dot(a, b) - dot product of two float arrays (one fused loop).",
      args => { arity(args, 2, "graft_vector_dot"); VectorDot(args(0), args(1)) }),
    ("graft_vector_l2sq",
      "graft_vector_l2sq(a, b) - squared L2 distance of two float arrays.",
      args => { arity(args, 2, "graft_vector_l2sq"); VectorL2Sq(args(0), args(1)) }),
    ("graft_simhash48",
      "graft_simhash48(shingles) - 48-bit simhash of a string array.",
      args => { arity(args, 1, "graft_simhash48"); SimHash48(args.head) }),
    ("graft_lsh_signature",
      "graft_lsh_signature(vec, planes, dims) - random-hyperplane LSH bits of a float array.",
      args => { arity(args, 3, "graft_lsh_signature")
        LshSignature(args.head, litInt(args(1), "planes"), litInt(args(2), "dims")) }),
    ("graft_minhash_bands",
      "graft_minhash_bands(shingles, k, band_size) - banded MinHash signature of a string array.",
      args => { arity(args, 3, "graft_minhash_bands")
        MinHashBands(args.head, litInt(args(1), "k"), litInt(args(2), "band_size")) }),
    ("graft_bounded_collect_set",
      "graft_bounded_collect_set(col, max) - collect_set capped at max values; NULL once exceeded.",
      args => { arity(args, 2, "graft_bounded_collect_set")
        BoundedCollectSet(args.head, litInt(args(1), "max")) }))

  /** Names, for registration tests. */
  private[graft] def names: Seq[String] = fns.map(_._1)
}
