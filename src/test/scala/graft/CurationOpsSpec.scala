package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextOps, VectorOps}

/** Round-5 curation operators: containment pairs (subset duplicates),
  * stratified hash-rank sampling, tf-idf distinctive terms, and the
  * embedding cluster-tightness report. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("containment flags a subset duplicate that Jaccard misses") {
    // doc 2 contains doc 1 verbatim plus 3× more material: every
    // shingle of 1 appears in 2 (containment 1.0), while the union is
    // dominated by 2's extra shingles (low jaccard)
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 30).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, "en", "s", small),
      (2L, "en", "s", s"$small $filler"),
      (3L, "en", "s", "totally unrelated words here")
    ).toDF("doc_id", "lang", "source", "text")
    val cont = TextOps.containmentPairsOf(docs, 0.9, 1000).collect()
    assert(cont.length == 1)
    assert(cont.head.getAs[Long]("doc_a") == 1L &&
      cont.head.getAs[Long]("doc_b") == 2L)
    assert(cont.head.getAs[Double]("containment") == 1.0)
    // the same pair does NOT clear a symmetric jaccard threshold
    val jac = TextOps.nearDupPairsOf(docs, 0.9, 1000).collect()
    assert(jac.isEmpty)
  }

  test("containment >= jaccard on every real co-shingled pair") {
    val c = TextOps.containmentPairs(spark, sfDir, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    val j = TextOps.nearDupPairs(spark, sfDir, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    assert(j.nonEmpty && j.keySet == c.keySet)
    j.foreach { case (k, jv) => assert(c(k) >= jv, s"$k: c=${c(k)} j=$jv") }
  }

  test("stratifiedSample: exactly k per stratum, deterministic, ranks total") {
    val k = 3
    val a = TextOps.stratifiedSample(spark, sfDir, k).collect()
    val b = TextOps.stratifiedSample(spark, sfDir, k).collect()
    assert(a.toSeq == b.toSeq) // same hash order every run
    val perStratum = a.groupBy(r => (r.getString(0), r.getString(1)))
    val strata = Tables.documents(spark, sfDir)
      .select(col("lang"), col("source")).distinct().count()
    assert(perStratum.size == strata)
    perStratum.foreach { case (_, rows) =>
      assert(rows.length <= k) // small strata keep everything they have
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length))
    }
  }

  test("tfidfTopTerms: rank bound, score arithmetic, hapax scores N") {
    val rows = TextOps.tfidfTopTerms(spark, sfDir, k = 3).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 3)
      val (tf, df, n) = (r.getAs[Long]("tf"), r.getAs[Long]("df"),
        r.getAs[Long]("n_docs"))
      assert(df <= n && tf >= df)
      assert(r.getAs[Double]("score") == (tf * n).toDouble / df.toDouble)
    }
  }

  test("mixSample realizes the target weights exactly (±1 doc scaling floor)") {
    val weights = Map("en" -> 0.4, "de" -> 0.25, "fr" -> 0.2, "es" -> 0.15)
    val rows = TextOps.mixSample(spark, sfDir).collect()
    val kept = rows.groupBy(_.getString(0)).view.mapValues(_.length.toLong)
    val quota = rows.map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    assert(kept.toMap == quota) // exactly quota docs per language
    // realized proportions track the weights: kept_l = floor(scale·w_l)
    val scale = quota.map { case (l, q) => q / weights(l) }
    assert(scale.max - scale.min <= 1.0 / weights.values.min,
      s"quotas not proportional: $quota")
    // deterministic: same selection every run
    assert(rows.toSeq == TextOps.mixSample(spark, sfDir).collect().toSeq)
  }

  test("tokenDeciles: rank-selected values reproduce a brute-force quantile") {
    import graft.functions.{TextFunctions => T}
    val got = TextOps.tokenDeciles(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val byLang = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"), T.tokenCount(col("text")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      (1 to 9).foreach { q =>
        val want = sorted((sorted.length * q + 9) / 10 - 1)
        assert(got((lang, q)) == want, s"$lang d$q")
      }
    }
    // deciles are non-decreasing within each language
    got.keys.map(_._1).toSeq.distinct.foreach { lang =>
      val vs = (1 to 9).map(q => got((lang, q)))
      assert(vs == vs.sorted, s"$lang: $vs")
    }
  }

  test("RankOps.decilesOf: one key spanning every range partition stays exact") {
    // the adversarial shape for the distributed selection: a SINGLE key
    // whose population must spread over many range partitions — the
    // per-partition offset arithmetic does all the work (a bug in the
    // cumulative offsets or a boundary re-draw between passes would
    // mis-rank immediately). 1000 distinct values + duplicate runs.
    import graft.operators.RankOps
    val vals = ((1 to 1000).map(i => ("only", (i * 7 % 500).toLong, i.toLong))
      ).toDF("k", "v", "tie")
    val got = RankOps.decilesOf(spark, vals, "k", "v", "tie", None)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    Engine.clearStaged(spark, blocking = true)
    val sorted = (1 to 1000).map(i => ((i * 7 % 500).toLong, i.toLong))
      .sortBy(identity).map(_._1)
    (1 to 9).foreach { q =>
      assert(got(q) == sorted((1000 * q + 9) / 10 - 1), s"d$q")
    }
  }

  test("piiAudit: fixture counts are exact ground truth; corpus is clean") {
    val rows = TextOps.piiAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val fx = rows("fixture")
    assert(fx.getAs[Long]("n_docs") == 3L)
    assert(fx.getAs[Long]("emails") == 3L)
    assert(fx.getAs[Long]("urls") == 2L)
    assert(fx.getAs[Long]("ips") == 3L)
    assert(fx.getAs[Long]("docs_flagged") == 3L)
    val corpus = rows("corpus")
    assert(corpus.getAs[Long]("docs_flagged") == 0L) // synthetic docs are clean
  }

  test("chunkDedup: totals reconcile with chunkDocs; counts are consistent") {
    val r = TextOps.chunkDedup(spark, sfDir).collect().head
    val total = TextOps.chunkDocs(spark, sfDir).count()
    assert(r.getAs[Long]("total_chunks") == total)
    assert(r.getAs[Long]("distinct_chunks") <= total)
    assert(r.getAs[Long]("redundant_chunks") ==
      total - r.getAs[Long]("distinct_chunks"))
    assert(r.getAs[Long]("dup_groups") <= r.getAs[Long]("distinct_chunks"))
  }

  test("trainingShards: manifest conserves the cleaned corpus's chunks") {
    val shards = TextOps.trainingShards(spark, sfDir).collect()
    assert(shards.nonEmpty)
    // every chunk of every cleaned doc lands in exactly one shard
    val perDoc = TextOps.cleanedDocs(
        Engine.spread(Tables.documents(spark, sfDir)), 0.08, 0.5, 1000)
      .select(size(col("t")).as("n")).collect().map(_.getInt(0))
    val expectChunks = perDoc.map(n => math.max((n - 10 + 39) / 40, 1).toLong).sum
    assert(shards.map(_.getAs[Long]("n_chunks")).sum == expectChunks)
    // shard ids are distinct, assignment is deterministic
    assert(shards.map(_.getInt(0)).distinct.length == shards.length)
    assert(shards.map(_.toSeq).toSeq ==
      TextOps.trainingShards(spark, sfDir).collect().map(_.toSeq).toSeq)
  }

  test("packSequences: tape arithmetic — bins by first-token position, conserves docs/tokens") {
    // one shard so the tape is a single sequence; cap 10 tokens.
    // doc 1: 4 tokens -> starts at 0  -> bin 0
    // doc 2: 5 tokens -> starts at 4  -> bin 0
    // doc 3: 3 tokens -> starts at 9  -> bin 0 (straddles into bin 1)
    // doc 4: 12 tokens -> starts at 12 -> bin 1 (longer than the cap)
    // doc 5: 1 token  -> starts at 24 -> bin 2
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e"), (3L, "a b c"),
      (4L, (1 to 12).map("w" + _).mkString(" ")), (5L, "z"))
      .toDF("doc_id", "text")
    val out = TextOps.packSequencesOf(docs, nShards = 1, contextTokens = 10)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("first_doc"),
        r.getAs[Long]("last_doc")))
    assert(out.toSeq == Seq((0L, 3L, 12L, 1L, 3L), (1L, 1L, 12L, 4L, 4L),
      (2L, 1L, 1L, 5L, 5L)))
    // conservation at fixture scale: every doc lands in exactly one bin,
    // token totals survive the packing
    val fx = TextOps.packSequences(spark, sfDir).collect()
    val docsTotal = Tables.documents(spark, sfDir).count()
    assert(fx.map(_.getAs[Long]("n_docs")).sum == docsTotal)
    // plan: ONE exchange (hash on shard) feeding the window sort — the
    // groupBy above it rides the same partitioning (partial+final agg),
    // plus the final presentation sort's range exchange
    val plan = TextOps.packSequences(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, plan)
  }

  test("packCuts: exactly the boundaries strictly inside docs, offsets in (0, n)") {
    // same tape as the packSequences test (cap 10): boundaries at 10
    // (inside doc 3: 9..12, cut 1 token in) and 20 (inside doc 4:
    // 12..24, cut 8 in); 30 falls beyond the 25-token tape
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d e"), (3L, "a b c"),
      (4L, (1 to 12).map("w" + _).mkString(" ")), (5L, "z"))
      .toDF("doc_id", "text")
    val cuts = TextOps.packCutsOf(docs, nShards = 1, contextTokens = 10)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("cut_offset")))
    assert(cuts.toSeq == Seq((1L, 3L, 1L), (2L, 4L, 8L)))
    // fixture-scale invariant: every cut is strictly interior to its doc
    val fx = TextOps.packCuts(spark, sfDir)
      .join(Tables.documents(spark, sfDir)
        .select($"doc_id", size(graft.functions.TextFunctions.tokens($"text"))
          .cast("long").as("n")), "doc_id")
      .select($"cut_offset", $"n").collect()
    assert(fx.nonEmpty)
    fx.foreach { r =>
      val (off, n) = (r.getLong(0), r.getLong(1))
      assert(off > 0 && off < n, s"cut $off not interior to doc of $n tokens")
    }
  }

  test("packClean: packs exactly the cleaned survivors, token totals agree") {
    val packed = TextOps.packClean(spark, sfDir).collect()
    val clean = TextOps.corpusClean(spark, sfDir).collect()
    // doc and token conservation against the cleaner's own rollup
    assert(packed.map(_.getAs[Long]("n_docs")).sum ==
      clean.map(_.getAs[Long]("n_docs")).sum)
    assert(packed.map(_.getAs[Long]("n_tokens")).sum ==
      clean.map(_.getAs[Long]("total_tokens")).sum)
    // strictly fewer (or equal) docs than packing the raw corpus
    val raw = TextOps.packSequences(spark, sfDir).collect()
    assert(packed.map(_.getAs[Long]("n_docs")).sum <=
      raw.map(_.getAs[Long]("n_docs")).sum)
  }

  test("clusterTightness: covers the corpus, mean sits inside [min, max]") {
    val rows = VectorOps.clusterTightness(spark, sfDir).collect()
    val total = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val (avg, lo, hi) = (r.getAs[Double]("avg_l2sq"),
        r.getAs[Double]("min_l2sq"), r.getAs[Double]("max_l2sq"))
      // fixed-point floor can undershoot the true mean by < 1e-6
      assert(avg >= lo - 1e-6 && avg <= hi, r.toString)
      assert(lo <= hi)
    }
  }
}
