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
    tableFns.foreach { case (name, usage, builder) =>
      e.injectTableFunction((FunctionIdentifier(name),
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

  private def litStr(e: Expression, what: String): String = e match {
    case f if f.foldable &&
        f.dataType == org.apache.spark.sql.types.StringType =>
      f.eval() match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        case null => throw new IllegalArgumentException(
          s"$what must not be NULL")
      }
    case other => throw new IllegalArgumentException(
      s"$what must be a STRING literal, got $other")
  }

  /** TABLE functions (`SELECT * FROM graft_table_at(...)`) — the SQL
    * surface of the snapshot table's time-travel / CDC / pruned-read
    * machinery, so verbatim-SQL users reach what the Scala API's
    * `read(version)`, `readAsOf(ts)`, `changeRowsBetween` and
    * `readWhere` reach (Trino/Delta's `FOR VERSION AS OF` /
    * `table_changes(...)` parity). Arguments must be literals: they
    * resolve a MANIFEST at plan time, exactly like the Scala
    * parameters. `graft_read_where` takes its predicate as a SQL
    * string and plans partition + zone + Bloom file skipping from it —
    * a plain `WHERE` over `graft_table_at` cannot reach manifest-level
    * pruning, which is the entire point of that entry. */
  private[graft] val tableFns
      : Seq[(String, String, Seq[Expression] => org.apache.spark.sql
        .catalyst.plans.logical.LogicalPlan)] = {
    import graft.operators.SnapshotTable
    def active = org.apache.spark.sql.SparkSession.active
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed
    Seq(
      ("graft_table_at",
        "graft_table_at(dir[, version_or_ts]) - snapshot table read: " +
          "latest, at an INT version, or as-of a timestamp string.",
        args => {
          if (args.isEmpty || args.length > 2)
            throw new IllegalArgumentException(
              "graft_table_at expects (dir[, version_or_ts])")
          val dir = litStr(args.head, "graft_table_at dir")
          val df =
            if (args.length == 1) SnapshotTable.read(active, dir)
            else args(1).dataType match {
              case org.apache.spark.sql.types.IntegerType =>
                SnapshotTable.read(active, dir,
                  Some(litInt(args(1), "graft_table_at version")))
              case _ =>
                val ts = java.sql.Timestamp.valueOf(
                  litStr(args(1), "graft_table_at ts")
                    .replace("T", " "))
                SnapshotTable.readAsOf(active, dir, ts.getTime)
            }
          planOf(df)
        }),
      ("graft_table_changes",
        "graft_table_changes(dir, from_version, to_version) - the " +
          "row-level change feed (insert/delete markers with exact " +
          "pre-images) between two versions.",
        args => {
          arity(args, 3, "graft_table_changes")
          planOf(SnapshotTable.changeRowsBetween(active,
            litStr(args.head, "graft_table_changes dir"),
            litInt(args(1), "graft_table_changes from"),
            litInt(args(2), "graft_table_changes to")))
        }),
      ("graft_read_where",
        "graft_read_where(dir, predicate_sql[, version]) - predicate-" +
          "pruned read: partition + zone + Bloom file skipping derived " +
          "from the predicate, which also applies row-level.",
        args => {
          if (args.length < 2 || args.length > 3)
            throw new IllegalArgumentException(
              "graft_read_where expects (dir, predicate_sql[, version])")
          val dir = litStr(args.head, "graft_read_where dir")
          val pred = org.apache.spark.sql.functions.expr(
            litStr(args(1), "graft_read_where predicate_sql"))
          val v =
            if (args.length == 3)
              Some(litInt(args(2), "graft_read_where version"))
            else None
          planOf(SnapshotTable.readWhere(active, dir, pred, v))
        }))
  }

  /** Names, for registration tests. */
  private[graft] def names: Seq[String] = fns.map(_._1)

  /** Table-function names, for registration tests. */
  private[graft] def tableNames: Seq[String] = tableFns.map(_._1)
}
