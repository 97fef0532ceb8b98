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
}
