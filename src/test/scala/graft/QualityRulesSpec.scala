package graft

import graft.operators.TextOps

/** Each Gopher-style quality rule must FIRE on a crafted bad document
  * (the fixture corpus is clean, so the oracle differential alone only
  * proves the zero case for most rules). */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val good = "the quick brown fox jumps over a lazy dog and then " +
    "walks away into the calm evening woods looking for food"

  test("decontaminateAgainst: verbatim eval doc scores overlap 1.0; clean doc absent") {
    val evalSet = Seq((0L, good)).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, good),                                           // verbatim leak
      (11L, good + " followed by a long appended tail of many extra " +
        "original words that dilute the overlapping prefix well below " +
        "half of the total five gram count for this document"), // partial leak
      (12L, "completely unrelated content about orbital mechanics and " +
        "spacecraft navigation systems during launch windows")
    ).toDF("doc_id", "text")
    val out = TextOps.decontaminateAgainst(corpus, evalSet, 5, 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(10L))
    assert(out(10L) == 1.0)
    // lowering the threshold surfaces the partial leak too
    val loose = TextOps.decontaminateAgainst(corpus, evalSet, 5, 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(loose == Set(10L, 11L))
  }

  test("every rule fires on its crafted violation and only that one") {
    val docs = Seq(
      ("good", good),
      ("short", "the small cats sit here"),                 // < 10 tokens
      ("longwords", "the a of extraordinarily incomprehensibilities " +
        "overenthusiastically institutionalizations characteristically " +
        "electroencephalographically internationalizations " +
        "compartmentalizations misinterpretations disproportionately"), // mean len > 10
      ("repeat", "the cat sat the cat sat the cat sat the cat sat " +
        "the cat sat the cat sat the cat sat"),             // dup 2-grams
      ("nostop", "zebra quagga okapi tapir binturong pangolin axolotl " +
        "echidna wombat numbat kinkajou cassowary"),        // no EN stopword
      ("symbols", "the a of x@#$% y&*()! z%%^^&& w$$##@@ v!!??++ " +
        "u((>>)) t{{}}[[ s<<>>~~ r||\\\\// q__==--")          // symbol-heavy
    ).toDF("source", "text")
    val out = TextOps.qualityRulesOf(docs).collect()
      .map(r => r.getString(0) -> r).toMap

    def fails(src: String): Seq[String] = {
      val r = out(src)
      Seq("r_too_short", "r_word_len", "r_repetition", "r_no_stopword",
        "r_symbol_heavy").filter(n => r.getAs[Long](n) == 1L)
    }
    assert(fails("good").isEmpty && out("good").getAs[Long]("n_pass") == 1L)
    assert(fails("short") == Seq("r_too_short"))
    assert(fails("longwords") == Seq("r_word_len"))
    assert(fails("repeat") == Seq("r_repetition"))
    assert(fails("nostop") == Seq("r_no_stopword"))
    assert(fails("symbols") == Seq("r_symbol_heavy"))
    Seq("short", "longwords", "repeat", "nostop", "symbols")
      .foreach(s => assert(out(s).getAs[Long]("n_pass") == 0L, s))
  }
}
