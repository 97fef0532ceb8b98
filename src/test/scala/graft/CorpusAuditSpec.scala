package graft

import graft.operators.TextOps

/** [[graft.operators.TextOps.corpusCleanAudit]]: the composed
  * clean+audit pass must (a) conserve documents through the funnel,
  * (b) report exactly the kept-corpus stats [[TextOps.corpusClean]]
  * reports, and (c) produce a posting-cap audit that bites when the
  * cap is tight. */
class CorpusAuditSpec extends SparkSpec {

  test("funnel counters conserve documents per block") {
    val rows = TextOps.corpusCleanAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val in = r.getAs[Long]("n_docs_in")
      val funnel = r.getAs[Long]("n_exact_dropped") +
        r.getAs[Long]("n_neardup_dropped") +
        r.getAs[Long]("n_quality_dropped") + r.getAs[Long]("n_kept")
      assert(in == funnel, r.toString)
    }
  }

  test("kept stats agree with corpusClean block by block") {
    val audit = TextOps.corpusCleanAudit(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) -> r)
      .toMap
    val clean = TextOps.corpusClean(spark, sfDir).collect()
    assert(clean.nonEmpty)
    clean.foreach { c =>
      val a = audit((c.getAs[String]("lang"), c.getAs[String]("source")))
      assert(a.getAs[Long]("n_kept") == c.getAs[Long]("n_docs"))
      assert(a.getAs[Long]("kept_tokens") == c.getAs[Long]("total_tokens"))
      assert(a.getAs[Double]("avg_quality") == c.getAs[Double]("avg_quality"))
      assert(a.getAs[Long]("kept_min_doc_id") == c.getAs[Long]("min_doc_id"))
      assert(a.getAs[Long]("kept_max_doc_id") == c.getAs[Long]("max_doc_id"))
    }
    // a block corpusClean omits (nothing kept) must audit as n_kept = 0
    val cleanKeys = clean
      .map(c => (c.getAs[String]("lang"), c.getAs[String]("source"))).toSet
    audit.collect { case (k, a) if !cleanKeys(k) =>
      assert(a.getAs[Long]("n_kept") == 0L, a.toString)
      assert(a.isNullAt(a.fieldIndex("avg_quality")), a.toString)
    }
  }

  test("posting-cap audit bites at a tight cap, counts are consistent") {
    val tight = TextOps.corpusCleanAudit(spark, sfDir, maxDf = 2).collect()
    assert(tight.map(_.getAs[Long]("posting_groups_capped")).sum > 0)
    tight.foreach { r =>
      val g = r.getAs[Long]("posting_groups_capped")
      val m = r.getAs[Long]("posting_members_capped")
      assert(g <= r.getAs[Long]("posting_groups"), r.toString)
      // every capped group has df > maxDf = 2, i.e. at least 3 members
      assert(m >= 3 * g, r.toString)
    }
  }
}
