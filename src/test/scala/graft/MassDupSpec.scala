package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.BoundedCollectSet.boundedCollectSet
import graft.operators.TextOps

/** Duplicate-heavy-corpus robustness (round-2 VERDICT item 1): the
  * banded LSH operators must survive the data shape a dedup pipeline
  * actually processes — mass byte-identical documents — without an
  * unbounded collect_set bucket, while still reporting every pair.
  */
class MassDupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while many other words fill this document with content"
  private val base2 =
    "completely different subject matter about spacecraft navigation systems and orbital mechanics calculations during launch"
  private val nearA =
    "training data pipelines deduplicate documents using minhash signatures over shingle sets for scalable similarity detection"
  // one appended token: jaccard 0.929 (3 of 4 minhash bands agree),
  // hamming 5 (1 of 4 simhash bands agrees) — verified deterministic
  // collisions, so the pair MUST surface through both band searches
  private val nearB = nearA + " exactly"

  /** 200 identical docs + a 5-dup group + a distinct near-dup pair. */
  private def corpus: DataFrame = {
    val rows =
      (0L until 200L).map(i => (i, base)) ++
      (200L until 205L).map(i => (i, base2)) ++
      Seq((300L, nearA), (301L, nearB))
    rows.toDF("doc_id", "text").repartition(4)
  }

  private val withinPairs = 200 * 199 / 2 + 5 * 4 / 2 // 19910

  test("dedupMinhash: mass duplicates collapse before banding; all pairs still reported") {
    val out = TextOps.dedupMinhashOf(corpus, 12, 3, 0.05, 1000)
      .collect()
    // no pair reported twice
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === out.length)
    val exact = out.filter(_.getDouble(2) == 1.0)
    assert(exact.length === withinPairs, "every identical-content pair, exactly once")
    // the distinct near-dup pair survives with its true (high) jaccard
    val nd = out.filter(r => r.getLong(0) == 300L && r.getLong(1) == 301L)
    assert(nd.length === 1)
    assert(nd.head.getDouble(2) > 0.8 && nd.head.getDouble(2) < 1.0)
  }

  test("dedupMinhash: maxBucket caps candidate generation but never exact-dup recall") {
    val out = TextOps.dedupMinhashOf(corpus, 12, 3, 0.05, 1)
      .collect()
    // the (300,301) bucket holds 2 distinct reps > cap → dropped (the
    // recall knob); within-group pairs don't ride through buckets at all
    assert(out.length === withinPairs)
    assert(out.forall(_.getDouble(2) == 1.0))
  }

  test("simhashPairs: mass duplicates collapse on the signature value; all pairs reported") {
    val out = TextOps.simhashPairsOf(corpus, 12, 1000).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === out.length)
    val exact = out.filter(_.getInt(2) == 0)
    assert(exact.length >= withinPairs, "identical content is hamming 0, exactly once")
    val nd = out.filter(r => r.getLong(0) == 300L && r.getLong(1) == 301L)
    assert(nd.length === 1)
    assert(nd.head.getInt(2) > 0 && nd.head.getInt(2) <= 12)
  }

  test("simhashPairs: maxBucket drops oversize distinct-signature buckets only") {
    val out = TextOps.simhashPairsOf(corpus, 12, 1).collect()
    assert(out.forall(_.getInt(2) == 0), "only the unconditional exact-dup pairs remain")
    assert(out.length >= withinPairs)
  }

  test("lshCalibration: mass duplicates pre-collapse; weighted counts exact; cap spares the dup mass") {
    // round-6 VERDICT item 4: the unbanded-corpus form filled band
    // buckets with every duplicate id, so maxBucket dropped exactly the
    // dup-mass pairs the calibration exists to report. Post-collapse,
    // the 19910 identical-content pairs ride the WEIGHTED within-group
    // branch (all k/r bands, jaccard 1.0) and never touch a bucket.
    val out = TextOps.lshCalibrationOf(corpus, 12, 3, 0.05, 1000)
      .collect().map(r => r.getLong(0) -> r).toMap
    Engine.clearStaged(spark, blocking = true)
    val all = out(4L)
    assert(all.getAs[Long]("n_pairs") === withinPairs.toLong)
    assert(all.getAs[Double]("avg_jaccard") === 1.0)
    assert(all.getAs[Double]("min_jaccard") === 1.0)
    assert(all.getAs[Long]("n_above_threshold") === withinPairs.toLong)
    val nd = out(3L) // the near-dup pair: 3 of 4 bands, true jaccard
    assert(nd.getAs[Long]("n_pairs") === 1L)
    assert(nd.getAs[Double]("min_jaccard") > 0.8 &&
      nd.getAs[Double]("max_jaccard") < 1.0)
    // cap = 1: every multi-rep bucket drops (the stated recall knob) —
    // the near-dup pair is the ONLY loss; the dup mass is untouched
    val capped = TextOps.lshCalibrationOf(corpus, 12, 3, 0.05, 1).collect()
    Engine.clearStaged(spark, blocking = true)
    assert(capped.length === 1)
    assert(capped.head.getLong(0) === 4L)
    assert(capped.head.getAs[Long]("n_pairs") === withinPairs.toLong)
  }

  test("lshCalibration stages only collapse keys, group metadata, rep shingles") {
    import org.apache.spark.sql.types.ArrayType
    Engine.clearStaged(spark, blocking = true)
    TextOps.lshCalibrationOf(corpus, 12, 3, 0.05, 1000)
      .write.format("noop").mode("overwrite").save()
    val staged = Engine.stagedSchemas(spark)
    assert(staged.size === 3, staged.toString)
    val arrayFrames =
      staged.filter(_.fields.exists(_.dataType.isInstanceOf[ArrayType]))
    // the one array-carrying frame is the rep-shingle frame (doc_id, sh)
    // — distinct-text reps, never the raw corpus
    assert(arrayFrames.size === 1 &&
      arrayFrames.head.fieldNames.toSeq === Seq("doc_id", "sh"),
      staged.toString)
    Engine.clearStaged(spark, blocking = true)
  }

  test("nearDupPairs: boilerplate shingles cap out of candidate generation") {
    // ten docs in one block share ONLY a boilerplate header; two of them
    // also share real content. With maxDf=5 the header shingles (df=10)
    // drop from the posting lists: header-only pairs disappear, the
    // genuinely-similar pair survives on its own shingles
    val header = "standard corporate disclaimer header boilerplate text"
    val docs = (
      (0L until 8L).map(i =>
        (i, "en", "s0", s"$header unique$i apple$i banana$i cherry$i")) ++
      Seq((100L, "en", "s0",
            header + " shared real content sentence about spacecraft"),
          (101L, "en", "s0",
            header + " shared real content sentence about spacecraft today"))
    ).toDF("doc_id", "lang", "source", "text")
    val uncapped = TextOps.nearDupPairsOf(docs, 0.01, 1000).collect()
    assert(uncapped.length > 10, "header-only pairs appear without the cap")
    val capped = TextOps.nearDupPairsOf(docs, 0.01, 5).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((100L, 101L)), capped.mkString(","))
  }

  test("embeddingNearDup: oversized blocks are excluded by maxBlock") {
    import graft.operators.VectorOps
    // hot cluster of 8 identical vectors + a small pair; cap 5 excludes
    // the hot label entirely, keeping only the small block's pair
    val v = Seq(1.0f, 0.0f)
    val rows = (0L until 8L).map(i => (i, 0, v)) ++
      Seq((100L, 1, v), (101L, 1, v))
    val df = rows.toDF("vec_id", "label", "embedding")
    val uncapped = VectorOps.embeddingNearDupOf(df, 0.5, 10000).collect()
    assert(uncapped.length == 8 * 7 / 2 + 1)
    val capped = VectorOps.embeddingNearDupOf(df, 0.5, 5).collect()
    assert(capped.map(r => (r.getLong(1), r.getLong(2))).toSeq
      == Seq((100L, 101L)), capped.mkString(","))
  }

  test("annLsh: a hot signature bucket is excluded by maxBucket") {
    import graft.operators.VectorOps
    // identical embeddings share every hyperplane sign → one bucket of 8;
    // a distinct well-separated pair lands elsewhere (verified below)
    val hot = (0 until 64).map(i => if (i == 0) 1.0f else 0.0f)
    val other = (0 until 64).map(i => if (i == 1) 1.0f else 0.1f)
    val other2 = (0 until 64).map(i => if (i == 1) 1.0f else 0.11f)
    val rows = (0L until 8L).map(i => (i, hot)) ++
      Seq((100L, other), (101L, other2))
    val df = rows.toDF("vec_id", "embedding")
    val un = VectorOps.annLshOf(df, 12, 0.2, 10000).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(un.contains((100L, 101L)) && un.size == 8 * 7 / 2 + 1,
      s"hot-bucket pairs + the distinct pair expected, got $un")
    val capped = VectorOps.annLshOf(df, 12, 0.2, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), capped)
  }

  test("boundedCollectSet: exact below the cap, NULL above it, across partitions") {
    val df = (0 until 3000).map {
      case i if i < 2500 => ("hot", i)    // 2500 distinct values
      case i => ("cold", i % 7)           // 7 distinct values
    }.toDF("k", "v").repartition(8)
    val agg = df.groupBy($"k")
      .agg(boundedCollectSet($"v", 1000).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Int](1))).toMap
    assert(agg("hot").isEmpty, "group over the cap evaluates to NULL")
    assert(agg("cold").map(_.toSet.size) === Some(7), "group under the cap is exact")
  }

  test("boundedCollectSet: repeated struct values dedup (canonical element form)") {
    // 5000 copies of the SAME struct value across 8 partitions with cap
    // 10: must dedup to one element, never trip the cap. Guards the
    // element canonicalization — raw GenericInternalRow storage has
    // identity equals and would count every copy as distinct (false
    // overflow), and sort-based fallback merges mix update-origin and
    // deserialize-origin representations
    val df = (0 until 5000).map(_ => ("k", 1L, "same")).toDF("k", "a", "b")
      .repartition(8)
    val r = df.groupBy($"k")
      .agg(boundedCollectSet(struct($"a", $"b"), 10).as("ids"))
      .collect().head
    assert(!r.isNullAt(1), "identical values must never overflow the cap")
    assert(r.getSeq[Any](1).size === 1)
  }

  test("capOverflowAudit: zero drops on a clean frame, every mechanism counted on mass near-dups") {
    // 120 distinct single-sentence docs differing only in a trailing
    // token: NOT exact duplicates (pre-collapse keeps all 120 reps) but
    // they share posting lists and collide in minhash/simhash bands —
    // the shape that silently loses recall at the caps. Deterministic:
    // md5-driven, counts pinned by the DuckDB oracle of
    // q_dedup_overflow's massdup scope too.
    val docs = spark.range(120).select(col("id").as("doc_id"),
      lit("xx").as("lang"), lit("fx").as("source"),
      concat(lit("the quick brown fox jumps over the lazy dog variant "),
        col("id").cast("string")).as("text"))
    val embs = spark.range(90).select(col("id").as("vec_id"),
      lit("zz").as("label"), array(lit(1.0f)).as("embedding"))
    def byMech(maxDf: Int, maxBucket: Int, maxBlock: Int) =
      TextOps.capOverflowAuditOf(docs, embs, maxDf, maxBucket, maxBlock)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // generous caps: the audit reports full recall (all-zero drops)
    val clean = byMech(1000, 1000, 10000)
    assert(clean.size === 4)
    assert(clean.values.forall { case (g, m) => g == 0L && m == 0L }, clean)
    // caps under the fixture's group sizes: every mechanism reports
    // nonzero dropped groups with their member counts
    val tight = byMech(50, 20, 80)
    assert(tight("posting_df")._1 === 8L, tight)
    assert(tight("minhash_bucket")._1 === 4L, tight)
    assert(tight("simhash_bucket")._1 === 2L, tight)
    assert(tight("embedding_block") === ((1L, 90L)), tight)
  }

  test("boundedCollectSet: struct elements and the exact-cap boundary") {
    val df = (0 until 100).map(i => ("k", i.toLong, s"s$i")).toDF("k", "a", "b")
      .repartition(5)
    val at = df.groupBy($"k")
      .agg(boundedCollectSet(struct($"a", $"b"), 100).as("ids"))
      .collect().head
    assert(at.getSeq[Any](1).size === 100, "exactly-at-cap group is kept complete")
    val over = df.groupBy($"k")
      .agg(boundedCollectSet(struct($"a", $"b"), 99).as("ids"))
      .collect().head
    assert(over.isNullAt(1), "one over the cap → NULL, never a truncated set")
  }
}
