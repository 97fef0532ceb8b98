package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal fixture generator: replicates the driver's read-only
  * sf0.1 star schema (TESTDATA.md) by an integer `factor` into a local
  * directory, preserving every distribution property the engine's
  * operators key on so per-query times measured on the output are a
  * faithful 10×/30× rehearsal — the round-9 VERDICT's top ask (convert
  * the 100 TB design claims from plan-pinned to measured).
  *
  * Faithful-scaling rules (why each table scales the way it does):
  *
  *  - Keyed tables offset every key by `replica × stride` (stride =
  *    max(key)+1 of the source), so referential integrity holds inside
  *    each replica and EVERY key-space cardinality — customers,
  *    suppliers, orders, users, docs, vectors — scales ×factor.
  *    Group-by fan-out, join fan-in, and window partition counts all
  *    scale linearly, which is what a real corpus does.
  *  - Name columns that feed count-distinct/group-by (`c_name`,
  *    `s_name`) get a per-replica suffix — 10× providers, not the same
  *    1000 providers with 10× rows each.
  *  - `nation`/`region` stay fixed (TPC-H semantics: geo dims do not
  *    scale) and low-cardinality attributes (segments, priorities,
  *    flags, event types, langs, labels-per-replica) keep their source
  *    distribution.
  *  - `orders`/`lineitem`/`events` keep their source timestamps: the
  *    same calendar window at ×factor density — time-windowed
  *    aggregates keep their group counts while per-group volume grows,
  *    and per-user session structure is preserved exactly (each new
  *    user is a time-shifted-by-zero clone of a source user).
  *  - `documents`: replica r>0 suffixes every odd-position token with
  *    `r<r>` and appends one `zzr<r>` token. Within a replica the
  *    duplicate/near-dup structure is IDENTICAL to the source (dup
  *    groups scale ×factor in count, not in size); across replicas
  *    every 3-token shingle window contains a suffixed token, so
  *    cross-replica Jaccard is ~0 and the banded dedup operators see
  *    ×factor distinct content, not factor-sized near-dup cliques
  *    (which would turn their banded joins quadratic for fixture
  *    reasons, not operator reasons).
  *  - `embeddings`: replica r>0 rotates the 64 dims by 7r (mod 64) and
  *    offsets `label` by r×(maxLabel+1). Inner products are invariant
  *    under a SHARED permutation, so within-replica geometry (norms,
  *    cosines, cluster tightness) is bit-preserved, while a vector and
  *    its rotation are as unrelated as two random draws — cross-replica
  *    cosine ~0. With labels in per-replica space, label-blocked
  *    operators get ×factor blocks of UNCHANGED size: the honest shape
  *    of a corpus whose cluster count grows with its size.
  *
  * Usage: `runMain graft.ScaleGen <srcDir> <outDir> <factor>`
  * (defaults: /root/testdata/sf0.1 data/sf1 10). Output layout matches
  * TESTDATA.md (`<outDir>/<table>.parquet`), so `SPARK_GRAFT_SF_DIR`
  * points Bench at it unchanged.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("data/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    require(factor >= 1, "factor must be >= 1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, factor)
    spark.stop()
  }

  /** Stride = max(key)+1, read once per source table. */
  private def strideOf(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head.getLong(0) + 1L

  private def replicate(src: DataFrame, factor: Int)(
      arm: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => arm(src, r)).reduce(_ unionByName _)

  def generate(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    def write(name: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      val n = spark.read.parquet(s"$outDir/$name.parquet").count()
      println(s"[scalegen] $name: $n rows")
    }

    // fixed dims: copied once, never scaled
    for (t <- Seq("region", "nation"))
      write(t, Tables.load(spark, srcDir, t), 1)

    val cust = Tables.customer(spark, srcDir)
    val custStride = strideOf(cust, "c_custkey")
    write("customer", replicate(cust, factor) { (df, r) =>
      df.select(
        (col("c_custkey") + lit(r * custStride)).as("c_custkey"),
        (if (r == 0) col("c_name")
         else concat(col("c_name"), lit(s"r$r"))).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }, 4)

    val supp = Tables.supplier(spark, srcDir)
    val suppStride = strideOf(supp, "s_suppkey")
    write("supplier", replicate(supp, factor) { (df, r) =>
      df.select(
        (col("s_suppkey") + lit(r * suppStride)).as("s_suppkey"),
        (if (r == 0) col("s_name")
         else concat(col("s_name"), lit(s"r$r"))).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    }, 1)

    val part0 = Tables.part(spark, srcDir)
    val partStride = strideOf(part0, "p_partkey")
    write("part", replicate(part0, factor) { (df, r) =>
      df.select(
        (col("p_partkey") + lit(r * partStride)).as("p_partkey"),
        (if (r == 0) col("p_name")
         else concat(col("p_name"), lit(s"r$r"))).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
    }, 4)

    val ord = Tables.orders(spark, srcDir)
    val ordStride = strideOf(ord, "o_orderkey")
    write("orders", replicate(ord, factor) { (df, r) =>
      df.select(
        (col("o_orderkey") + lit(r * ordStride)).as("o_orderkey"),
        (col("o_custkey") + lit(r * custStride)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }, 16)

    val li = Tables.lineitem(spark, srcDir)
    write("lineitem", replicate(li, factor) { (df, r) =>
      df.select(
        (col("l_orderkey") + lit(r * ordStride)).as("l_orderkey"),
        (col("l_partkey") + lit(r * partStride)).as("l_partkey"),
        (col("l_suppkey") + lit(r * suppStride)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }, 32)

    // events through Tables.events: ts normalized to TIMESTAMP µs
    // regardless of the source file's physical encoding
    val ev = Tables.events(spark, srcDir)
    val evStride = strideOf(ev, "event_id")
    val userStride = strideOf(ev, "user_id")
    write("events", replicate(ev, factor) { (df, r) =>
      df.select(
        (col("event_id") + lit(r * evStride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r * userStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, 16)

    val docs = Tables.documents(spark, srcDir)
    val docStride = strideOf(docs, "doc_id")
    write("documents", replicate(docs, factor) { (df, r) =>
      val text =
        if (r == 0) col("text")
        else concat(
          array_join(transform(split(trim(col("text")), "\\s+"),
            (t, i) => when(i % 2 === 1, concat(t, lit(s"r$r")))
              .otherwise(t)), " "),
          lit(s" zzr$r"))
      df.select(
        (col("doc_id") + lit(r * docStride)).as("doc_id"),
        text.as("text"), col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, 8)

    val emb = Tables.embeddings(spark, srcDir)
    val labelStride =
      emb.agg(max(col("label"))).head.getInt(0) + 1
    val vecStride = strideOf(emb, "vec_id")
    val dims = VectorDims
    write("embeddings", replicate(emb, factor) { (df, r) =>
      val rot = (7 * r) % dims
      val rotated =
        if (rot == 0) col("embedding")
        else array((0 until dims).map(d =>
          element_at(col("embedding"), ((d + rot) % dims) + 1)): _*)
      df.select(
        (col("vec_id") + lit(r * vecStride)).as("vec_id"),
        rotated.as("embedding"),
        (col("label") + lit(r * labelStride)).as("label"))
    }, 8)
  }

  private val VectorDims = graft.operators.VectorOps.Dims
}
