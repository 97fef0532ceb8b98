package graft

import java.io.File
import org.apache.spark.sql.functions._
import graft.operators.SnapshotTable

/** Per-file Bloom index (round 15): the equality-pruning half zone
  * maps can't provide. Pins:
  *  - on a HASH-distributed key column (every file's min/max spans the
  *    whole domain) the Bloom probe names ~only the files truly
  *    holding the probed keys, while the zone probe keeps everything
  *  - losslessness: the probe result is always a superset of the files
  *    truly holding the keys (readKeys == plain filter, MoR-aware)
  *  - absent keys prune to zero candidates → keyed DML no-ops without
  *    a data read
  *  - files appended AFTER the build are always-candidates until
  *    [[SnapshotTable.refreshFileBlooms]] covers them (O(new files),
  *    reusing the old sidecar's still-live rows)
  *  - an all-null column file is covered (marker row) and prunable —
  *    absence of words ≠ absence of coverage
  *  - historic probes consult the index live AT THAT VERSION (meta is
  *    carried per-root)
  *  - vacuum keeps the sidecar the kept roots reference and drops
  *    orphans
  */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._
  import SnapshotTable._

  private val base = "target/test_bloom_index"

  private def wipe(dir: String): Unit = {
    def del(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del); f.delete()
    }
    val root = new File(dir)
    if (root.exists()) del(root)
  }

  /** n rows hash-distributed over `parts` files within one partition —
    * every file's key zone spans ~the whole domain. */
  private def hashTable(dir: String, n: Int, parts: Int): Unit = {
    wipe(dir)
    val df = (0 until n).map(i => (f"K$i%05d", "b1", i * 1.0, 2000, 1))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")
      .repartition(parts, col("claim_id"))
    append(spark, dir, df, statsColumns = Seq("claim_id"),
      rebalance = false)
  }

  test("hash-distributed keys: zones keep every file, the Bloom names ~the true holders") {
    val dir = s"$base/hash"
    hashTable(dir, 2000, 8)
    buildFileBlooms(spark, dir, Seq("claim_id"))
    val keys = Seq("K00007").toDF("claim_id")
    val v = latestVersion(spark, dir)
    val zone = candidateFilesByKeyZone(spark, dir, keys, "claim_id", v)
    assert(zone.size >= 5, s"hash distribution defeats zones: $zone")
    val pruned = candidateFilesForKeys(spark, dir, keys, "claim_id", v)
    // the true holder plus possible Bloom false positives (~0.24%)
    assert(pruned.nonEmpty && pruned.size <= 2,
      s"Bloom must name ~1 of 8 files, got ${pruned.size}")
    val truth = read(spark, dir).filter(col("claim_id") === "K00007")
      .select(input_file_name()).distinct().count()
    assert(truth == 1)
  }

  test("readKeys is exact and MoR-delete-aware on a Bloom-indexed table") {
    val dir = s"$base/readkeys"
    hashTable(dir, 500, 8)
    buildFileBlooms(spark, dir, Seq("claim_id"))
    val keys = Seq("K00001", "K00042", "K00499", "KNOPE").toDF("claim_id")
    val got = readKeys(spark, dir, keys, "claim_id")
      .select("claim_id").as[String].collect().sorted
    assert(got.toSeq == Seq("K00001", "K00042", "K00499"))
    // MoR-delete one looked-up key: the Bloom still names its file
    // (false positive by design), the read funnel drops the row
    deleteKeysMor(spark, dir, Seq("K00042").toDF("claim_id"))
    val after = readKeys(spark, dir, keys, "claim_id")
      .select("claim_id").as[String].collect().sorted
    assert(after.toSeq == Seq("K00001", "K00499"))
  }

  test("absent keys prune to zero candidates and keyed MoR delete no-ops without a commit") {
    val dir = s"$base/absent"
    hashTable(dir, 300, 4)
    buildFileBlooms(spark, dir, Seq("claim_id"))
    val v = latestVersion(spark, dir)
    // IN-RANGE absent keys: the zone probe alone cannot prune these
    // (they sort inside the files' min/max), only the Bloom can
    val absent = Seq("K00050X", "K00123X").toDF("claim_id")
    assert(candidateFilesByKeyZone(spark, dir, absent, "claim_id", v)
      .nonEmpty, "in-range keys must defeat the zone probe")
    val cands = candidateFilesForKeys(spark, dir, absent, "claim_id", v)
    assert(cands.isEmpty, s"absent keys must prune everything: $cands")
    assert(deleteKeysMor(spark, dir,
      Seq("K00050X").toDF("claim_id")).isEmpty)
    assert(latestVersion(spark, dir) == v, "no commit for a no-op")
  }

  test("post-build appends stay candidates until refreshFileBlooms covers them") {
    val dir = s"$base/refresh"
    hashTable(dir, 400, 4)
    buildFileBlooms(spark, dir, Seq("claim_id"))
    // the append commits WITHOUT key zones — the new file is zoneless
    // AND Bloom-uncovered, the always-candidate worst case
    append(spark, dir,
      Seq(("XNEW1", "b2", 1.0, 2000, 2)).toDF("claim_id", "batch_id",
        "claim_amount", "service_year", "service_month"))
    val v = latestVersion(spark, dir)
    // the new file has no marker: any probe keeps it (lossless)...
    val cands = candidateFilesForKeys(spark, dir,
      Seq("NOPE").toDF("claim_id"), "claim_id", v)
    assert(cands.size == 1 && cands.head.contains("month=2"),
      s"uncovered file must stay a candidate: $cands")
    // ...refresh covers it (and only it) with the SAME geometry
    val rv = refreshFileBlooms(spark, dir)
    assert(rv.nonEmpty)
    val after = candidateFilesForKeys(spark, dir,
      Seq("NOPE").toDF("claim_id"), "claim_id", rv.get)
    assert(after.isEmpty, s"covered file must prune: $after")
    val hit = candidateFilesForKeys(spark, dir,
      Seq("XNEW1").toDF("claim_id"), "claim_id", rv.get)
    assert(hit.exists(_.contains("month=2")),
      "the refreshed Bloom must still find the new key")
    // a second refresh with nothing uncovered is a no-op
    assert(refreshFileBlooms(spark, dir).isEmpty)
  }

  test("an all-null column's file is covered and prunable, not ambiguous") {
    val dir = s"$base/allnull"
    wipe(dir)
    append(spark, dir,
      Seq((Option.empty[String], "b1", 1.0, 2000, 1),
          (Option.empty[String], "b1", 2.0, 2000, 1))
        .toDF("claim_id", "batch_id", "claim_amount", "service_year",
          "service_month").coalesce(1))
    buildFileBlooms(spark, dir, Seq("claim_id"))
    val v = latestVersion(spark, dir)
    val cands = candidateFilesForKeys(spark, dir,
      Seq("ANY").toDF("claim_id"), "claim_id", v)
    assert(cands.isEmpty,
      s"an all-null file can never equality-match: $cands")
  }

  test("historic probes consult the index live at that version") {
    val dir = s"$base/historic"
    hashTable(dir, 200, 4) // v1: no index
    val v1 = latestVersion(spark, dir)
    buildFileBlooms(spark, dir, Seq("claim_id")) // v2: indexed
    val v2 = latestVersion(spark, dir)
    val keys = Seq("K00050X").toDF("claim_id") // in-range, absent
    assert(candidateFilesForKeys(spark, dir, keys, "claim_id", v1)
      .nonEmpty, "pre-index versions must not see the index")
    assert(candidateFilesForKeys(spark, dir, keys, "claim_id", v2)
      .isEmpty)
  }

  test("vacuum keeps the referenced sidecar and drops orphaned ones") {
    val dir = s"$base/vacuum"
    hashTable(dir, 200, 4)
    buildFileBlooms(spark, dir, Seq("claim_id"))
    buildFileBlooms(spark, dir, Seq("claim_id")) // supersedes the first
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bloomsDir = new org.apache.hadoop.fs.Path(s"$dir/_snapshots/blooms")
    assert(fs.listStatus(bloomsDir).length == 2)
    vacuum(spark, dir, retainLast = 1)
    val left = fs.listStatus(bloomsDir).map(_.getPath.getName).toSeq
    assert(left.length == 1, s"orphaned sidecar must go: $left")
    val meta = commitMeta(spark, dir)
    assert(meta("bloom.index") == s"blooms/${left.head}")
    // and the survivor still probes (in-range absent key: only the
    // Bloom can prune it)
    val v = latestVersion(spark, dir)
    assert(candidateFilesForKeys(spark, dir,
      Seq("K00050X").toDF("claim_id"), "claim_id", v).isEmpty)
  }

  test("readWhere routes string equality conjuncts through the Bloom index") {
    val dir = s"$base/readwhere"
    hashTable(dir, 1000, 8)
    buildFileBlooms(spark, dir, Seq("claim_id"))
    val (_, live, kept) = readWherePlanned(spark, dir,
      col("claim_id") === "K00007" && col("claim_amount") >= 0.0)
    assert(kept < live && kept >= 1,
      s"equality on the indexed key must Bloom-prune ($kept of $live)")
    val got = readWhere(spark, dir, col("claim_id") === "K00007")
      .select("claim_id", "claim_amount").as[(String, Double)].collect()
    assert(got.toSeq == Seq(("K00007", 7.0)))
    // in-range absent key: zero files read, zero rows, still correct
    val (_, _, kept2) = readWherePlanned(spark, dir,
      col("claim_id") === "K00500X")
    assert(kept2 == 0)
    assert(readWhere(spark, dir, col("claim_id") === "K00500X")
      .count() == 0)
  }

  test("readWhere numeric equality Bloom-prunes via canonical rendering — zero false negatives") {
    val dir = s"$base/numeq"
    hashTable(dir, 300, 4)
    // index the NUMERIC column: `=== 7` renders "7" while the index
    // hashed the double's "7.0" — the probe must cast to the COLUMN's
    // type first, so int/long/double probes all land on "7.0"
    buildFileBlooms(spark, dir, Seq("claim_amount"))
    Seq(lit(7), lit(7L), lit(7.0)).foreach { k =>
      val got = readWhere(spark, dir, col("claim_amount") === k)
        .select("claim_id").as[String].collect()
      assert(got.toSeq == Seq("K00007"), s"probe $k")
    }
    // amounts are one-per-file here only by luck of the hash; assert
    // the plan actually pruned (files kept < live) for the int probe
    val (_, live, kept) = readWherePlanned(spark, dir,
      col("claim_amount") === 7)
    assert(kept < live && kept >= 1, s"numeric Bloom prune ($kept/$live)")
  }

  test("typed-mismatched probe keys canonicalize: int keys against a double column lose nothing") {
    val dir = s"$base/typedkeys"
    wipe(dir)
    // claim_amount double, whole-valued; Bloom on it; probe with INTS
    val df = (0 until 200).map(i => (f"K$i%05d", "b1", i * 1.0, 2000, 1))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month").repartition(4, col("claim_id"))
    append(spark, dir, df, statsColumns = Seq("claim_amount"),
      rebalance = false)
    buildFileBlooms(spark, dir, Seq("claim_amount"))
    val intKeys = Seq(7, 63).toDF("claim_amount")
    val got = readKeys(spark, dir, intKeys, "claim_amount")
      .select("claim_id").as[String].collect().toSet
    assert(got == Set("K00007", "K00063"),
      s"int probes on a double column must not false-negative: $got")
  }

  test("non-canonical date literals canonicalize for zone AND Bloom probes") {
    val dir = s"$base/datecanon"
    wipe(dir)
    // DATE-typed column, zone-clustered so the zone probe is live too
    val df = (0 until 300).map { i =>
      val d = java.time.LocalDate.of(1997, 1 + i % 12, 1 + i % 28)
      (f"K$i%05d", "b1", java.sql.Date.valueOf(d), 2000, 1)
    }.toDF("claim_id", "batch_id", "service_date", "service_year",
      "service_month")
      .repartitionByRange(4, col("service_date"))
      .sortWithinPartitions(col("service_date"))
    append(spark, dir, df, statsColumns = Seq("service_date"),
      rebalance = false)
    buildFileBlooms(spark, dir, Seq("service_date"))
    // "1997-9-9" matches rows (Spark coerces) but renders non-ISO:
    // without canonicalization the zone probe compares it wrong
    // lexicographically and the Bloom hashed "1997-09-09"
    val expect = read(spark, dir)
      .filter(col("service_date") === lit("1997-9-9"))
      .count()
    assert(expect > 0, "fixture must hold 1997-09-09 rows")
    assert(readWhere(spark, dir,
      col("service_date") === "1997-9-9").count() == expect)
    // a string key set probing the DATE column through readKeys
    val got = readKeys(spark, dir,
      Seq("1997-9-9").toDF("service_date"), "service_date").count()
    assert(got == expect, s"string date probe lost rows: $got/$expect")
    // garbage literal: zero rows, no error (cast nulls → lossless skip)
    assert(readWhere(spark, dir,
      col("service_date") === "not-a-date").count() == 0)
  }

  test("merge and deleteKeys on a Bloom-indexed table produce exact content") {
    val dir = s"$base/dml"
    hashTable(dir, 300, 4)
    buildFileBlooms(spark, dir, Seq("claim_id"))
    merge(spark, dir,
      Seq(("K00007", "b9", 999.0, 2000, 1)).toDF("claim_id", "batch_id",
        "claim_amount", "service_year", "service_month"))
    deleteKeys(spark, dir, Seq("K00008").toDF("claim_id"))
    val got = read(spark, dir)
      .filter(col("claim_id").isin("K00007", "K00008"))
      .select("claim_id", "claim_amount").as[(String, Double)]
      .collect().toMap
    assert(got == Map("K00007" -> 999.0))
    assert(read(spark, dir).count() == 299)
  }
}
