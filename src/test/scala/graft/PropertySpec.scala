package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Cleansing, TextFunctions => T}

/** Property tests (SURVEY.md §5d): ScalaCheck generators drive the
  * inputs; each property evaluates as ONE Spark job over a generated
  * frame (not one job per sample). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 300): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  test("∀ inputs: quality score lands in {0, 0.3, 0.5, 0.7, 1.0}") {
    val gen = for {
      cid <- Gen.option(Gen.alphaNumStr)
      mid <- Gen.option(Gen.alphaNumStr)
      dt <- Gen.option(Gen.choose(0, 20000)) // days since epoch
      amt <- Gen.chooseNum(-1e7, 1e7)
    } yield (cid, mid, dt, amt)
    val df = samples(gen).toDF("cid", "mid", "days", "amt")
      .select(Cleansing.qualityScore($"cid", $"mid",
        date_add(lit("1970-01-01").cast("date"), $"days"), $"amt").as("s"))
    val scores = df.distinct().as[Double].collect().toSet
    assert(scores.subsetOf(Set(0.0, 0.3, 0.5, 0.7, 1.0)), scores)
  }

  test("∀ inputs: (score >= 0.5) ⇔ (claim_id AND member_id non-null) — the gate rewrite") {
    val gen = for {
      cid <- Gen.option(Gen.alphaNumStr)
      mid <- Gen.option(Gen.alphaNumStr)
      dt <- Gen.option(Gen.choose(0, 20000))
      amt <- Gen.chooseNum(-1e7, 1e7)
    } yield (cid, mid, dt, amt)
    val df = samples(gen, 500).toDF("cid", "mid", "days", "amt")
      .select(
        (Cleansing.qualityScore($"cid", $"mid",
          date_add(lit("1970-01-01").cast("date"), $"days"), $"amt") >= 0.5)
          .as("by_score"),
        ($"cid".isNotNull && $"mid".isNotNull).as("by_rewrite"))
    assert(df.filter(not($"by_score" <=> $"by_rewrite")).count() == 0)
  }

  test("∀ amounts: category partitions; clamp is non-negative and idempotent") {
    val df = samples(Gen.oneOf(
        Gen.chooseNum(-1e6, 1e6),
        Gen.oneOf(0.0, 100.0, 1000.0, 10000.0, -0.0)), 500)
      .toDF("a")
      .select($"a", Cleansing.clampAmount($"a").as("c"))
      .withColumn("cat", Cleansing.amountCategory($"c"))
      .withColumn("cc", Cleansing.clampAmount($"c"))
    val rows = df.collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("c")
      assert(c >= 0.0)
      assert(c == r.getAs[Double]("cc")) // idempotent
      val expected =
        if (c == 0.0) "ZERO" else if (c <= 100) "LOW" else if (c <= 1000) "MEDIUM"
        else if (c <= 10000) "HIGH" else "VERY_HIGH"
      assert(r.getAs[String]("cat") == expected, s"$c")
    }
    assert(rows.map(_.getAs[String]("cat")).toSet.size >= 4)
  }

  test("∀ valid dates: all three formats parse; ISO round-trips exactly") {
    val gen = for {
      y <- Gen.choose(1970, 2029)
      m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
    } yield (y, m, d)
    val df = samples(gen).toDF("y", "m", "d")
      .select(make_date($"y", $"m", $"d").as("dt"))
      .select($"dt",
        Cleansing.parseServiceDate(date_format($"dt", "yyyy-MM-dd")).as("iso"),
        Cleansing.parseServiceDate(date_format($"dt", "MM/dd/yyyy")).as("us"),
        Cleansing.parseServiceDate(date_format($"dt", "dd/MM/yyyy")).as("eu"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[java.sql.Date]("iso") == r.getAs[java.sql.Date]("dt"))
      assert(!r.isNullAt(r.fieldIndex("us")))
      assert(!r.isNullAt(r.fieldIndex("eu"))) // may mis-parse (day<=12) but never null
    }
  }

  test("∀ texts: jaccard(x,x)=1, jaccard∈[0,1], shingle set is distinct") {
    val word = Gen.oneOf("a", "b", "cat", "dog", "x1", "longword")
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val df = samples(Gen.zip(text, text), 200).toDF("x", "y")
      .withColumn("tx", T.tokens($"x")).withColumn("ty", T.tokens($"y"))
      .select(
        T.jaccard(T.shinglesOf($"tx", 3), T.shinglesOf($"tx", 3)).as("self"),
        T.jaccard(T.shinglesOf($"tx", 3), T.shinglesOf($"ty", 3)).as("cross"),
        (size(array_distinct(T.shinglesOf($"tx", 3))) ===
          size(T.shinglesOf($"tx", 3))).as("distinct_ok"))
    df.collect().foreach { r =>
      assert(r.getAs[Double]("self") == 1.0)
      val x = r.getAs[Double]("cross")
      assert(x >= 0.0 && x <= 1.0)
      assert(r.getAs[Boolean]("distinct_ok"))
    }
  }

  test("∀ texts: bpe token count ≥ whitespace token count on space-joined words") {
    val word = Gen.oneOf("hello", "42", "a1b2", "x,y", "dots...")
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val df = samples(text, 200).toDF("t")
      .select(T.tokenCount($"t").as("ws"), T.bpeTokenCount($"t").as("bpe"))
    df.collect().foreach { r =>
      assert(r.getAs[Int]("bpe") >= r.getAs[Int]("ws"))
    }
  }

  test("∀ texts: contentHash invariant under case, internal whitespace runs, space padding") {
    // contract: INTERNAL whitespace runs (any \s) collapse to one space,
    // but trim strips only ASCII spaces at the edges (same in DuckDB — a
    // trailing tab is part of the canonical form on both engines)
    val word = Gen.oneOf("Alpha", "beta", "GAMMA", "d1")
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val mangle = for {
      t <- text
      pad <- Gen.oneOf("  ", "\t", " \n ")
      up <- Gen.oneOf(true, false)
    } yield (t, "  " + (if (up) t.toUpperCase else t).replace(" ", pad) + "  ")
    val df = samples(mangle, 200).toDF("a", "b")
      .select((T.contentHash($"a") === T.contentHash($"b")).as("same"))
    assert(df.filter(not($"same")).count() == 0)
  }

  test("∀ frames: boundedCollectSet == collect_set when under the cap, NULL over it") {
    import graft.expressions.BoundedCollectSet.boundedCollectSet
    val gen = for {
      k <- Gen.choose(0, 5)
      v <- Gen.choose(0, 30)
    } yield (s"k$k", v)
    val df = samples(gen, 600).toDF("k", "v").repartition(7)
    val both = df.groupBy($"k")
      .agg(collect_set($"v").as("stock"),
        boundedCollectSet($"v", 8).as("bounded"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val stock = r.getSeq[Int](1).toSet
      if (stock.size <= 8)
        assert(Option(r.getSeq[Int](2)).map(_.toSet).contains(stock), r)
      else assert(r.isNullAt(2), r)
    }
  }

  test("∀ texts: nfc is idempotent and normalizes combining == precomposed") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const("café"), Gen.const("café"),
      Gen.const("über"), Gen.const("über")))
      .map(_.mkString(" "))
    val df = samples(gen, 400).toDF("s")
      .select(T.nfc($"s").as("n1"), T.nfc(T.nfc($"s")).as("n2"),
        T.contentHash($"s").as("h"),
        T.contentHash(T.nfc($"s")).as("hn"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1), "idempotent")
      assert(r.getString(2) == r.getString(3), "contentHash already canonicalizes")
    }
    // the two accent encodings collapse to one hash
    val hs = Seq("x café y", "x café y").toDF("s")
      .select(T.contentHash($"s")).distinct().count()
    assert(hs == 1)
  }

  test("∀ feature sets: SimHash48 is order-invariant and in [0, 2^48)") {
    val word = Gen.oneOf("a", "b", "cat", "dog gram", "x1 y2 z3")
    val feats = Gen.nonEmptyListOf(word).map(_.distinct)
    val df = samples(feats, 200).map(f => (f, f.reverse))
      .toDF("f", "shuf")
      .select(T.simhash48($"f").as("s1"), T.simhash48($"shuf").as("s2"))
    df.collect().foreach { r =>
      val s = r.getAs[Long]("s1")
      assert(s == r.getAs[Long]("s2")) // bit sums commute
      assert(s >= 0L && s < (1L << 48))
    }
  }

  test("∀ texts: textQuality ∈ [0,1]; equal shingle sets agree on every minhash band") {
    val word = Gen.oneOf("the", "a", "of", "cat", "dog", "lorem", "ipsum")
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val qdf = samples(text, 200).toDF("t")
      .select(T.textQuality($"t").as("q"))
    qdf.collect().foreach { r =>
      val q = r.getAs[Double]("q")
      assert(q >= 0.0 && q <= 1.0, q)
    }
    // identical sets in different order ⇒ identical band values (array_min
    // over salted hashes is order-free)
    val perm = samples(Gen.nonEmptyListOf(word).map(_.distinct), 100)
      .map(f => (f, f.reverse)).toDF("f", "r")
    val bands = T.minhashBands($"f", 12, 3).zip(T.minhashBands($"r", 12, 3))
      .zipWithIndex.map { case ((x, y), i) => (x === y).as(s"b$i") }
    val bad = perm.select(bands: _*).collect()
      .count(r => (0 until 4).exists(i => !r.getAs[Boolean](s"b$i")))
    assert(bad == 0)
  }
}
