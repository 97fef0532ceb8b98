package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.operators.{TextOps, VectorOps}

/** Unit semantics for the training-data-pipeline operators. */
class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount / charCount / distinctTokenRatio") {
    val r = Seq("  the quick  brown the  ").toDF("t").select(
      T.tokenCount($"t").as("n"),
      T.charCount($"t").as("c"),
      T.distinctTokenRatio($"t").as("d")).head
    assert(r.getAs[Int]("n") == 4)
    assert(r.getAs[Int]("c") == 16) // thequickbrownthe
    assert(r.getAs[Double]("d") == 0.75)
  }

  test("langId picks marker-majority language with fixed tiebreak") {
    val got = Seq(
      "the cat and the hat", // en
      "der hund und die katze ist", // de
      "le chat et la maison est ici", // fr
      "el gato y los perros que", // es
      "xyzzy plugh" // unknown
    ).toDF("t").select(T.langId($"t")).as[String].collect()
    assert(got.toSeq == Seq("en", "de", "fr", "es", "unknown"))
  }

  test("shingles: distinct word 3-grams, short docs degrade gracefully") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(T.shingles($"t", 3).as("s")).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b")) // fewer tokens than n → one partial shingle
  }

  test("jaccard: exact ratio of set sizes") {
    val got = Seq(("a b c d", "a b c e")).toDF("x", "y")
      .select(T.jaccard(T.shingles($"x", 1), T.shingles($"y", 1)))
      .head.getDouble(0)
    assert(got == 3.0 / 5.0)
  }

  test("contentHash: normalization collapses case and whitespace") {
    val h = Seq(("The  Quick   Fox", "the quick fox")).toDF("a", "b")
      .select(T.contentHash($"a").as("ha"), T.contentHash($"b").as("hb")).head
    assert(h.getString(0) == h.getString(1))
  }

  test("native VectorDot == HOF formulation bit-for-bit on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val pairs = emb.select($"vec_id", $"embedding".as("a"))
      .crossJoin(emb.filter($"vec_id" < 3).select($"embedding".as("b")))
    val diff = pairs.select(
        V.dot($"a", $"b").as("native"), V.dotHof($"a", $"b").as("hof"))
      .filter(not($"native" <=> $"hof")).count()
    assert(diff == 0)
  }

  test("native LshSignature == HOF formulation bit-for-bit on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val diff = emb.select(
        V.lshSignature($"embedding", 12, 64).as("native"),
        V.lshSignatureHof($"embedding", 12, 64).as("hof"))
      .filter(not($"native" <=> $"hof")).count()
    assert(diff == 0)
    // more planes than the operator default, still bit-identical
    val diff2 = emb.select(
        V.lshSignature($"embedding", 24, 64).as("native"),
        V.lshSignatureHof($"embedding", 24, 64).as("hof"))
      .filter(not($"native" <=> $"hof")).count()
    assert(diff2 == 0)
  }

  test("LshSignature: wrong-length vectors yield signature 0, matching the HOF") {
    // zip_with null-pads the mismatched side, nulling every projection;
    // every bit falls to otherwise(0) — the native loop mirrors that
    val df = Seq(
      Seq.fill(64)(0.5f),          // contract length
      Seq(1.0f, 2.0f),             // too short
      Seq.fill(70)(0.25f)          // too long
    ).toDF("v")
    val rows = df.select(
      V.lshSignature($"v", 12, 64).as("native"),
      V.lshSignatureHof($"v", 12, 64).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(rows(1).getLong(0) == 0L && rows(2).getLong(0) == 0L)
  }

  test("LshSignature participates in whole-stage codegen (no fallback)") {
    val emb = Tables.embeddings(spark, sfDir)
    val exec = emb.select(V.lshSignature($"embedding", 12, 64).as("s"))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty &&
      inCodegen.map(_.toString).exists(_.contains("lsh_signature")),
      exec.toString)
  }

  test("VectorDot participates in whole-stage codegen (no fallback)") {
    val emb = Tables.embeddings(spark, sfDir)
    val exec = emb.select(V.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty &&
      inCodegen.head.toString.contains("vector_dot"), exec.toString)
    // interpreted-HOF marker must be absent from the native projection
    assert(!exec.toString.contains("zip_with"), exec.toString)
  }

  test("dot / l2Norm / cosine on known vectors") {
    val df = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(V.dot($"a", $"b").as("d"), V.l2Norm($"a").as("n"),
      V.cosine($"a", $"b").as("c")).head
    assert(r.getDouble(0) == 24.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == 24.0 / 25.0)
  }

  test("annBruteForce: k rows per query, self excluded, rank ordered") {
    val df = VectorOps.annBruteForce(spark, sfDir, k = 3)
    val byQuery = df.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 3)
      assert(!rows.exists(_.getAs[Long]("vec_id") == q))
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }

  test("annLsh buckets: same vector always collides with itself") {
    // signature is deterministic: running twice yields identical buckets
    val b1 = VectorOps.annLsh(spark, sfDir, planes = 8, minCos = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b2 = VectorOps.annLsh(spark, sfDir, planes = 8, minCos = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b1 == b2 && b1.nonEmpty)
  }

  test("annLsh candidates are high-recall for top brute-force pairs") {
    // every brute-force top-1 neighbor with cos>0.9 should share a bucket
    // with few planes (recall sanity, not exactness)
    val bf = VectorOps.annBruteForce(spark, sfDir, k = 1)
      .filter($"cos_sim" > 0.9).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
    val lsh = VectorOps.annLsh(spark, sfDir, planes = 4, minCos = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = bf.count { case (a, b) =>
      lsh.contains((math.min(a, b), math.max(a, b))) }
    assert(bf.isEmpty || hits >= bf.length / 2, s"recall $hits/${bf.length}")
  }

  test("nearDupPairs inverted-index == direct pairwise jaccard") {
    // the exploded-intersection form must reproduce the textbook
    // array_intersect/array_union definition exactly
    val direct = {
      val docs = Tables.documents(spark, sfDir)
        .select($"doc_id", $"lang", $"source", T.shingles($"text", 3).as("sh"))
      val a = docs.select($"doc_id".as("doc_a"), $"lang", $"source", $"sh".as("sh_a"))
      val b = docs.select($"doc_id".as("doc_b"), $"lang", $"source", $"sh".as("sh_b"))
      a.join(b, Seq("lang", "source")).filter($"doc_a" < $"doc_b")
        .withColumn("jaccard", T.jaccard($"sh_a", $"sh_b"))
        .filter($"jaccard" >= 0.08)
        .select($"doc_a", $"doc_b", $"jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val inverted = TextOps.nearDupPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(inverted == direct)
  }

  test("minhash: identical shingle sets agree on every band") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w q r"))
      .toDF("doc_id", "text")
    val bands = T.minhashBands(T.shingles($"text", 3), 12, 3)
    val rows = df.select($"doc_id" +:
      bands.zipWithIndex.map { case (c, j) => c.as(s"b$j") }: _*).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    val r2 = rows.find(_.getLong(0) == 2L).get
    val r3 = rows.find(_.getLong(0) == 3L).get
    (1 to 4).foreach { j =>
      assert(r1.getString(j) == r2.getString(j))
      assert(r1.getString(j) != r3.getString(j))
    }
  }

  test("simhash: deterministic, text-equality implies signature-equality") {
    val s1 = TextOps.simhashDocs(spark, sfDir).collect()
    val s2 = TextOps.simhashDocs(spark, sfDir).collect()
    assert(s1.sameElements(s2) && s1.nonEmpty)
    // signature fits in 48 bits
    s1.foreach(r => assert((r.getAs[Long]("simhash") >>> 48) == 0L))
  }

  test("simhash: near-identical texts have small hamming distance") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely unrelated words describing nothing similar at all")
    ).toDF("doc_id", "text")
    val withHashes = df.select($"doc_id", T.tokenHashes($"text").as("hs"))
    val withNibbles = withHashes.select($"doc_id" +:
      (0 until T.SimhashBits / 4).map(j => T.nibbleList($"hs", j).as(s"nib_$j")): _*)
    val sums = (0 until T.SimhashBits)
      .map(b => T.simhashBitSum(col(s"nib_${b / 4}"), b).as(s"bs_$b"))
    val sig = withNibbles.select($"doc_id" +: sums: _*)
      .select($"doc_id", T.simhashFromBitSums(
        (0 until T.SimhashBits).map(b => col(s"bs_$b"))).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(2L)) < hamming(sig(1L), sig(3L)))
  }

  test("native SimHash48 == layered HOF formulation bit-for-bit on real documents") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("t", T.tokens($"text"))
      .withColumn("sh", T.shinglesOf($"t", 3))
    val hof = docs
      .select($"doc_id", transform($"sh", s => md5(s)).as("hs"))
      .select($"doc_id" +:
        (0 until T.SimhashBits / 4).map(j => T.nibbleList($"hs", j).as(s"nib_$j")): _*)
      .select($"doc_id" +: (0 until T.SimhashBits)
        .map(b => T.simhashBitSum(col(s"nib_${b / 4}"), b).as(s"bs_$b")): _*)
      .select($"doc_id", T.simhashFromBitSums(
        (0 until T.SimhashBits).map(b => col(s"bs_$b"))).as("hof_sig"))
    val diff = docs.select($"doc_id", T.simhash48($"sh").as("native_sig"))
      .join(hof, "doc_id")
      .filter($"native_sig" =!= $"hof_sig").count()
    assert(diff == 0)
  }

  test("SimHash48 participates in whole-stage codegen; empty array sets all bits") {
    // input must be non-foldable or ConvertToLocalRelation collapses the
    // whole projection to a LocalTableScan before any codegen happens;
    // range+concat keeps a live Project under WholeStageCodegen
    val exec = spark.range(3)
      .select(T.simhash48(array(concat(lit("tok "), $"id".cast("string")))).as("s"))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty &&
      inCodegen.map(_.toString).exists(_.contains("simhash48")), exec.toString)
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(T.simhash48($"sh")).head.getLong(0)
    assert(empty == (1L << T.SimhashBits) - 1)
  }

  test("corpusClean: composed stages agree with the stand-alone operators") {
    val stats = TextOps.corpusClean(spark, sfDir).collect()
    assert(stats.nonEmpty)
    // surviving docs = exact-dedup keepers − near-dup doc_bs − low-quality
    val keepers = Tables.documents(spark, sfDir)
      .groupBy(T.contentHash($"text")).agg(min($"doc_id").as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val droppedB = TextOps.nearDupPairs(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_b")).toSet // pairs among keepers ⊆ all pairs
    val quality = Tables.documents(spark, sfDir)
      .select($"doc_id", T.textQuality($"text").as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = keepers.filterNot(droppedB).count(quality(_) >= 0.5)
    assert(stats.map(_.getAs[Long]("n_docs")).sum == expected,
      s"got ${stats.map(_.getAs[Long]("n_docs")).sum}, expected $expected")
    // textQualityOf over staged tokens is bit-identical to textQuality
    val diff = Tables.documents(spark, sfDir)
      .withColumn("t", T.tokens($"text"))
      .filter(T.textQualityOf($"t") =!= T.textQuality($"text")).count()
    assert(diff == 0)
  }

  test("simhashPairs: ordered pairs, hamming within threshold, self-pairs absent") {
    val rows = TextOps.simhashPairs(spark, sfDir, maxHamming = 12).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val h = r.getAs[Int]("hamming")
      assert(h >= 0 && h <= 12)
    }
    // pairs are unique
    val pairs = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.toSet.size == pairs.length)
  }

  test("fingerprint: equal texts collide, fingerprint is an md5 of a window") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "z z z z z z z z")).toDF("doc_id", "text")
    val fp = df.select($"doc_id", T.rollingFingerprint($"text", 5).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
    assert(fp(1L).matches("[0-9a-f]{32}"))
  }

  test("embeddingNearDup: pairs share label and clear the threshold") {
    val rows = VectorOps.embeddingNearDup(spark, sfDir, minCos = 0.3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("cos_sim") >= 0.3)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("annIvf: k rows per query, exact within the probed cells (the IVF contract)") {
    val ivf = VectorOps.annIvf(spark, sfDir, k = 5, nprobe = 2).collect()
    val byQuery = ivf.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 5)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 5)
      // ≤ nprobe distinct cells per query
      assert(rows.map(_.getAs[Int]("label")).toSet.size <= 2, s"query $q")
      // ranked descending on exact cosine
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
    // IVF == brute force restricted to the probed cells: for each query,
    // every returned neighbor beats any same-cell vector not returned
    val emb = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    byQuery.foreach { case (q, rows) =>
      val cells = rows.map(_.getAs[Int]("label")).toSet
      val returned = rows.map(_.getAs[Long]("vec_id")).toSet
      val minReturned = rows.map(_.getAs[Double]("cos_sim")).min
      val bfInCells = VectorOps.annBruteForce(spark, sfDir, k = 500).collect()
        .filter(r => r.getAs[Long]("query_id") == q &&
          cells.contains(emb(r.getAs[Long]("vec_id"))))
      val top5InCells = bfInCells.sortBy(r =>
        (-r.getAs[Double]("cos_sim"), r.getAs[Long]("vec_id")))
        .take(5).map(_.getAs[Long]("vec_id")).toSet
      assert(top5InCells == returned, s"query $q: min=$minReturned")
    }
  }

  test("native VectorL2Sq == HOF formulation bit-for-bit; codegen'd; mixed types") {
    // float embedding vs double centroid — the k-means assignment shape
    val emb = Tables.embeddings(spark, sfDir)
    val cent = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("cell"),
        transform($"embedding", x => x.cast("double")).as("centroid"))
    val pairs = emb.crossJoin(cent)
    val diff = pairs.select(
        VectorOps.l2sq($"embedding", $"centroid").as("native"),
        VectorOps.l2sqHof($"embedding", $"centroid").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0)
    // participates in whole-stage codegen over a non-foldable input
    val exec = spark.range(3)
      .select(array($"id".cast("float")).as("a"),
        array(($"id" + 1).cast("double")).as("b"))
      .select(VectorOps.l2sq($"a", $"b").as("d"))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty &&
      inCodegen.map(_.toString).exists(_.contains("vector_l2sq")), exec.toString)
  }

  test("native MinHashBands == HOF formulation bit-for-bit on real documents") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("t", T.tokens($"text"))
      .withColumn("sh", T.shinglesOf($"t", 3))
    val hofBands = T.minhashBands($"sh", 12, 3)
    // null-safe inequality: a plain =!= filter is null-blind and would
    // pass vacuously if either side ever went NULL
    val diff = docs.select(
        T.minhashBandsNative($"sh", 12, 3).as("nat"),
        array(hofBands: _*).as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
    // NULL-input contract divergence, pinned: native gives an honest
    // NULL; the HOF layering quirkily yields md5("") bands there
    val nullIn = Seq(Tuple1(Option.empty[Seq[String]])).toDF("sh")
      .select(T.minhashBandsNative($"sh", 12, 3).as("nat"),
        array(T.minhashBands($"sh", 12, 3): _*).as("hof"))
      .collect().head
    assert(nullIn.isNullAt(0) && !nullIn.isNullAt(1))
    // participates in whole-stage codegen over a non-foldable input
    val exec = spark.range(3)
      .select(array(concat($"id".cast("string"), lit(" words here")))
        .as("sh"))
      .select(T.minhashBandsNative($"sh", 12, 3).as("b"))
      .queryExecution.executedPlan
    val inCodegen = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty &&
      inCodegen.map(_.toString).exists(_.contains("minhash_bands")), exec.toString)
  }

  test("VectorDot / VectorL2Sq: ragged arrays return NULL, matching the HOF") {
    // native == HOF must hold UNCONDITIONALLY: zip_with null-pads the
    // shorter array, so the HOF yields null on a length mismatch — a
    // library caller must get that same honest null from the native
    // expressions, never a silent shorter-prefix value
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f, 1.0f)), // equal length
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 1.0f)),       // ragged
      (Seq(1.0f), Seq(1.0f, 5.0f))                    // ragged, other side
    ).toDF("a", "b")
    val rows = df.select(
      VectorOps.l2sq($"a", $"b").as("nat_l2"),
      VectorOps.l2sqHof($"a", $"b").as("hof_l2"),
      graft.functions.VectorFunctions.dot($"a", $"b").as("nat_dot"),
      graft.functions.VectorFunctions.dotHof($"a", $"b").as("hof_dot"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"l2sq null parity: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"dot null parity: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3))
    }
    assert(!rows.head.isNullAt(0) && rows.tail.forall(_.isNullAt(0)))
    assert(!rows.head.isNullAt(2) && rows.tail.forall(_.isNullAt(2)))
  }

  test("annIvfTrained: k-means assignment is a true argmin; k rows per query") {
    val emb = Tables.embeddings(spark, sfDir)
    // trainPct must match annIvfTrained's default (25% hash-sample)
    val cents = VectorOps.kmeansCentroids(emb, kCells = 8, iters = 2,
        trainPct = 25)
      .collect().map(r => r.getInt(0) ->
        r.getSeq[Double](1).toArray).sortBy(_._1)
    assert(cents.nonEmpty && cents.length <= 8)
    // every centroid is a fixed-point-mean vector of finite doubles
    cents.foreach { case (_, c) =>
      assert(c.length == VectorOps.Dims && c.forall(d => !d.isNaN && !d.isInfinite))
    }
    // spot-check the argmin property of the final assignment by recomputing
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    def d2(v: Array[Float], c: Array[Double]) =
      v.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + (x.toDouble - y) * (x.toDouble - y) }
    val rows = VectorOps.annIvfTrained(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    perQuery.values.foreach { rs =>
      assert(rs.length == 5)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
    }
    // the probed cells really are the 2 nearest trained cells per query
    for (q <- 0L to 4L) {
      val qv = vecs.toMap.apply(q)
      val nearest2 = cents.map { case (cell, c) => (d2(qv, c), cell) }
        .sortBy(identity).take(2).map(_._2).toSet
      val usedCells = perQuery(q).map(_.getAs[Int]("cell")).toSet
      assert(usedCells.subsetOf(nearest2), s"q=$q used=$usedCells near=$nearest2")
    }
  }

  test("chunkDocs: overlapped windows reconstruct the token stream exactly") {
    val chunkTokens = 50; val overlap = 10; val stride = chunkTokens - overlap
    val toks = Tables.documents(spark, sfDir)
      .withColumn("t", T.tokens($"text"))
      .select($"doc_id", $"t").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = TextOps.chunkDocs(spark, sfDir, chunkTokens, overlap)
      .collect().groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet == toks.keySet) // every doc chunked, even short ones
    chunks.foreach { case (id, rs) =>
      val t = toks(id)
      val sorted = rs.sortBy(_.getAs[Int]("chunk_idx"))
      assert(sorted.map(_.getAs[Int]("chunk_idx")).toSeq == sorted.indices.toSeq)
      val expectedN = math.max((t.length - overlap + stride - 1) / stride, 1)
      assert(sorted.length == expectedN, s"doc $id: ${t.length} tokens")
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expected = t.slice(i * stride, i * stride + chunkTokens)
        assert(r.getAs[Int]("n_chunk_tokens") == expected.length)
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(expected.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(r.getAs[String]("chunk_hash") == dig)
      }
    }
  }

  test("sampleDocs: deterministic, a subset, and near the requested fraction") {
    val total = Tables.documents(spark, sfDir).count()
    val s1 = TextOps.sampleDocs(spark, sfDir, pct = 20).collect()
    val s2 = TextOps.sampleDocs(spark, sfDir, pct = 20).collect()
    assert(s1.map(_.getLong(0)).toSeq == s2.map(_.getLong(0)).toSeq)
    val frac = s1.length.toDouble / total
    assert(frac > 0.1 && frac < 0.3, s"$frac of $total")
    // monotone: a larger pct strictly contains a smaller one
    val s50 = TextOps.sampleDocs(spark, sfDir, pct = 50).collect()
      .map(_.getLong(0)).toSet
    assert(s1.map(_.getLong(0)).toSet.subsetOf(s50))
  }

  test("dedupExact finds injected duplicates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello   World", "en", "s", 11L),
      (2L, "hello world", "en", "s", 11L),
      (3L, "something else", "en", "s", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("tmp_docs")
    val hashed = docs.select(T.contentHash($"text").as("h"))
      .groupBy($"h").count()
    assert(hashed.count() == 2)
    assert(hashed.filter($"count" === 2).count() == 1)
  }

  test("pqCodes: codes from trained books, recon error recomputed exactly, argmin true") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = VectorOps.pqCodebooks(emb)
    assert(books.size == 4)
    books.foreach { book =>
      assert(book.nonEmpty && book.size <= 8)
      book.foreach { case (code, cent) =>
        assert(code >= 0 && code < 8 && cent.size == 16)
        assert(cent.forall(d => !d.isNaN && !d.isInfinite))
      }
    }
    val rows = VectorOps.pqCodes(spark, sfDir).collect()
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val recon = (0 until 4).map { s =>
        val sv = v.slice(s * 16, (s + 1) * 16)
        val code = r.getAs[Int](s"code_$s")
        // the assigned code must exist in the book AND be a true argmin
        val dists = books(s).map { case (c, cent) =>
          c -> sv.zip(cent).map { case (x, y) =>
            (x.toDouble - y) * (x.toDouble - y) }.sum
        }
        val dmin = dists.map(_._2).min
        assert(dists.find(_._2 == dmin).get._1 == code,
          s"vec ${r.getAs[Long]("vec_id")} sub $s")
        dmin
      }.reduce(_ + _)
      assert(r.getAs[Double]("recon_l2sq") == recon,
        s"vec ${r.getAs[Long]("vec_id")}")
    }
  }

  test("ivfPqCodes: residual PQ beats raw PQ on total reconstruction error") {
    val raw = VectorOps.pqCodes(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("recon_l2sq"))
      .toMap
    val ivfpq = VectorOps.ivfPqCodes(spark, sfDir).collect()
    assert(ivfpq.length == raw.size)
    // the POINT of the residual composition: same 12 bits, less error
    val rawTotal = raw.values.sum
    val residTotal = ivfpq.map(_.getAs[Double]("recon_l2sq")).sum
    assert(residTotal < rawTotal,
      s"residual $residTotal !< raw $rawTotal")
    // structure: cells within the trained coarse domain, codes in range
    ivfpq.foreach { r =>
      assert(r.getAs[Int]("cell") >= 0 && r.getAs[Int]("cell") < 8)
      (0 until 4).foreach(s =>
        assert(r.getAs[Int](s"code_$s") >= 0 && r.getAs[Int](s"code_$s") < 8))
      assert(r.getAs[Double]("recon_l2sq") >= 0.0)
    }
  }

  test("annPq: ADC distances recompute exactly from codes + books; true top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = VectorOps.pqCodebooks(emb)
    val codes = VectorOps.pqCodes(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until 4).map(s => r.getAs[Int](s"code_$s"))).toMap
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    def adc(q: Array[Float], vid: Long): Double =
      (0 until 4).map { s =>
        val qsv = q.slice(s * 16, (s + 1) * 16)
        val cent = books(s).toMap.apply(codes(vid)(s))
        qsv.zip(cent).map { case (x, y) =>
          (x.toDouble - y) * (x.toDouble - y) }.sum
      }.reduce(_ + _)
    val rows = VectorOps.annPq(spark, sfDir).collect()
    assert(rows.length == 25) // 5 queries x k=5
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == (0L until 5L).toSet)
    byQuery.foreach { case (qid, rs) =>
      val q = vecs(qid)
      // reported distances recompute exactly, ranks sort by (dist, id)
      rs.foreach { r =>
        assert(r.getAs[Double]("adc_dist") == adc(q, r.getAs[Long]("vec_id")),
          s"query $qid vec ${r.getAs[Long]("vec_id")}")
      }
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Double]("adc_dist"), r.getAs[Long]("vec_id")))
      assert(sorted.sameElements(sorted.sorted), s"query $qid")
      // and it IS the global top-k over every candidate
      val kth = sorted.last
      val ord = implicitly[Ordering[(Double, Long)]]
      vecs.keys.filter(_ != qid).foreach { vid =>
        val d = adc(q, vid)
        assert(ord.gteq((d, vid), kth) || sorted.contains((d, vid)),
          s"query $qid missed vec $vid")
      }
    }
  }

  test("ivfPqBuild/ivfPqQuery: persisted index, query rows == self-contained search") {
    // isolated model dir: the lifecycle under test is write -> read
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_model").toString
    val manifest = VectorOps.ivfPqBuild(spark, sfDir, Some(dir)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every component persisted, with the cardinalities the model claims
    assert(manifest.keySet ==
      Set("centroids", "book_0", "book_1", "book_2", "book_3", "codes"))
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(manifest("codes") == nVecs)
    assert(manifest("centroids") > 0 && manifest("centroids") <= 8)
    (0 until 4).foreach(s =>
      assert(manifest(s"book_$s") > 0 && manifest(s"book_$s") <= 8))
    // artifacts are really on disk
    for (c <- Seq("centroids", "books", "codes"))
      assert(new java.io.File(s"$dir/$c").isDirectory, c)
    // the default-dir query path (build-if-absent, then persisted reads)
    // is row-identical to the self-contained search
    val viaModel = VectorOps.ivfPqQuery(spark, sfDir).collect()
      .map(_.toSeq)
    val selfContained = VectorOps.ivfPqSearch(spark, sfDir).collect()
      .map(_.toSeq)
    assert(viaModel.toSeq == selfContained.toSeq)
    // steady state: a second query call reuses the persisted model
    // (same rows again — nothing retrains or drifts)
    val again = VectorOps.ivfPqQuery(spark, sfDir).collect().map(_.toSeq)
    assert(again.toSeq == viaModel.toSeq)
  }
}
