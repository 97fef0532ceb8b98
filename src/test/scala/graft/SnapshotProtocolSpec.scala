package graft

import java.io.File
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.operators.{IncrementalGold, SnapshotConflictException, SnapshotTable}

/** Round-12 pins for the snapshot commit PROTOCOL (the two-level
  * chunked metadata, VERDICT r11 #1) and the concurrency-safety
  * contracts (ADVICE r11):
  *
  *  - commits are O(change): untouched chunks are carried into the next
  *    root BY REFERENCE (same chunk file name, never rewritten); an
  *    append adds exactly one chunk; a 1-partition overwrite rewrites
  *    only the chunks whose partition range intersects it
  *  - lost-update validation: an overwrite whose read snapshot was
  *    invalidated by a concurrent commit into the same partitions
  *    aborts with SnapshotConflictException instead of silently
  *    dropping the concurrent rows
  *  - rollbackTo is metadata-only (no data file created or deleted)
  *  - compactManifests reaches the target chunk count, moves no data
  *    file, and preserves content and zone stats
  *  - write-audit-publish: a failing batch never reaches main, a
  *    passing one lands exactly once, the audit branch ref is dropped
  *  - schema evolution: type WIDENING (int -> long) resolves from root
  *    metadata; a v1 time-travel read never sees a v2-added column
  *  - vacuumed history degrades incremental publish to a full
  *    republish, never a FileNotFoundException
  *  - partitionPredicate beyond MaxOrTerms still prunes at listing time
  */
class SnapshotProtocolSpec extends SparkSpec {

  import spark.implicits._

  private val base = "target/test_snapshot_protocol"

  private def wipe(dir: String): Unit = {
    def del(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del); f.delete()
    }
    val root = new File(dir)
    if (root.exists()) del(root)
  }

  private def rows(n: Int, month: Int, batch: String) =
    (0 until n).map(i => (s"K$month-$i", batch, i * 1.0, 2000, month))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")

  /** Chunk files referenced by version v's root. */
  private def chunksOf(dir: String, v: Int): Seq[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$dir/_snapshots/v$v%05d.txt")), "UTF-8")
    text.linesIterator.filter(_.startsWith("C\t"))
      .map(_.split("\t")(1)).toSeq
  }

  private def dataFiles(dir: String): Set[String] = {
    val root = new File(dir).toPath
    if (!root.toFile.exists()) return Set.empty
    val out = Set.newBuilder[String]
    java.nio.file.Files.walk(root).forEach { p =>
      val rel = root.relativize(p).toString
      if (rel.endsWith(".parquet") && !rel.startsWith("_snapshots") &&
          !rel.startsWith("_staging")) out += rel
    }
    out.result()
  }

  test("O(change) commits: untouched chunks carried by reference; append adds one chunk; overwrite rewrites only intersecting chunks") {
    val dir = s"$base/ochange"
    wipe(dir)
    // five appends into five months — five versions, below the tier-
    // merge threshold, so each commit writes exactly ONE new chunk
    (1 to 5).foreach(m => SnapshotTable.append(spark, dir, rows(3, m, s"b$m")))
    val c4 = chunksOf(dir, 4)
    val c5 = chunksOf(dir, 5)
    // v5 carries v4's chunks by NAME — untouched metadata is referenced,
    // never rewritten (the O(change) property)
    assert(c4.toSet.subsetOf(c5.toSet),
      s"v4 chunks must survive by reference in v5: $c4 vs $c5")
    assert(c5.size == c4.size + 1, s"append must add exactly one chunk: $c5")
    // a 1-partition overwrite: chunks whose range excludes month 2 are
    // carried by reference; only the intersecting chunk is rewritten
    SnapshotTable.overwritePartitions(spark, dir, rows(2, 2, "b2x"))
    val c6 = chunksOf(dir, 6)
    val untouched = c5.toSet.intersect(c6.toSet)
    assert(untouched.size >= 4,
      s"non-intersecting chunks must carry by reference: kept $untouched")
    // content is right: month 2 replaced, others intact
    val v6 = SnapshotTable.read(spark, dir, Some(6))
    assert(v6.filter(col("service_month") === 2).count() == 2)
    assert(v6.count() == 4 * 3 + 2)
  }

  test("tier merge bounds the root: many small appends never accumulate unbounded chunk references, and chunks stay partition-local") {
    val dir = s"$base/tiers"
    wipe(dir)
    (1 to 30).foreach(i =>
      SnapshotTable.append(spark, dir, rows(2, 1 + (i % 3), s"b$i")))
    val refs = chunksOf(dir, 30)
    // 30 commits into 3 partitions: the PER-PARTITION size-tiered merge
    // (round 14 — partition-major metadata) keeps each partition's
    // chunk list bounded, so the root holds O(partitions × tiers) refs
    assert(refs.size <= 15, s"root must stay bounded, got ${refs.size}")
    assert(SnapshotTable.read(spark, dir).count() == 60)
    // every chunk is partition-local: a partition-scoped commit/scan
    // later touches only its own partition's slice of the metadata
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f"$dir/_snapshots/v${30}%05d.txt")), "UTF-8")
    text.linesIterator.filter(_.startsWith("C\t")).foreach { l =>
      val ps = l.split("\t")
      assert(ps(3) == ps(4), s"chunk must span one partition: $l")
    }
  }

  test("lost-update validation: an overwrite computed from a stale snapshot aborts with SnapshotConflictException") {
    val dir = s"$base/conflict"
    wipe(dir)
    SnapshotTable.append(spark, dir, rows(5, 1, "b1"))
    val readV = SnapshotTable.latestVersion(spark, dir) // = 1
    // a concurrent writer lands an append INTO month 1 after our read
    SnapshotTable.append(spark, dir, rows(2, 1, "b2"))
    // our overwrite of month 1 was computed from v1 — committing it
    // would silently drop b2's rows; the protocol must refuse
    val ex = intercept[SnapshotConflictException] {
      SnapshotTable.overwritePartitions(spark, dir, rows(3, 1, "b3"),
        readVersion = Some(readV))
    }
    assert(ex.getMessage.contains("recompute"))
    // nothing was committed; the table still reads b1+b2
    assert(SnapshotTable.latestVersion(spark, dir) == 2)
    assert(SnapshotTable.read(spark, dir).count() == 7)
    // a DISJOINT-partition overwrite from the same stale snapshot is
    // NOT a conflict (the concurrent commit didn't touch month 2)
    SnapshotTable.append(spark, dir, rows(4, 2, "b1"))
    val v3 = SnapshotTable.latestVersion(spark, dir)
    SnapshotTable.append(spark, dir, rows(2, 1, "b4")) // month 1 again
    SnapshotTable.overwritePartitions(spark, dir, rows(1, 2, "b5"),
      readVersion = Some(v3)) // month 2 — composes fine
    assert(SnapshotTable.read(spark, dir)
      .filter(col("service_month") === 2).count() == 1)
  }

  test("rollbackTo is metadata-only: no data file created or deleted; the undone version stays time-travelable") {
    val dir = s"$base/rollback"
    wipe(dir)
    SnapshotTable.append(spark, dir, rows(5, 1, "b1"))
    SnapshotTable.append(spark, dir, rows(3, 2, "b2"))
    val filesBefore = dataFiles(dir)
    val v = SnapshotTable.rollbackTo(spark, dir, 1)
    assert(v == 3)
    assert(dataFiles(dir) == filesBefore, "rollback must move no data")
    // v3 content == v1 content; chunks shared by name
    assert(chunksOf(dir, 3) == chunksOf(dir, 1))
    assert(SnapshotTable.read(spark, dir).count() == 5)
    // the rolled-back v2 is still readable (history preserved)
    assert(SnapshotTable.read(spark, dir, Some(2)).count() == 8)
  }

  test("compactManifests: target chunk count, no data file moved, stats preserved") {
    val dir = s"$base/mcompact"
    wipe(dir)
    (1 to 6).foreach(m => SnapshotTable.append(spark, dir,
      rows(3, m, s"b$m"), statsColumns = Seq("claim_amount")))
    val filesBefore = dataFiles(dir)
    val statsBefore = SnapshotTable.readStats(spark, dir, 6)
    val contentBefore = SnapshotTable.read(spark, dir)
      .collect().map(_.toSeq).toSet
    val v = SnapshotTable.compactManifests(spark, dir, targetChunks = 2)
    assert(chunksOf(dir, v).size == 2)
    assert(dataFiles(dir) == filesBefore, "manifest rewrite moves no data")
    assert(SnapshotTable.readStats(spark, dir, v) == statsBefore,
      "zone stats must survive the manifest rewrite byte-for-byte")
    assert(SnapshotTable.read(spark, dir).collect().map(_.toSeq).toSet
      == contentBefore)
  }

  test("write-audit-publish: failing batch never reaches main; passing batch lands exactly once; branch ref dropped") {
    val dir = s"$base/wap"
    wipe(dir)
    SnapshotTable.append(spark, dir, rows(5, 1, "base"))
    val mainBefore = SnapshotTable.latestVersion(spark, dir)
    val bad = rows(3, 2, "bad")
      .withColumn("claim_id", lit(null).cast("string"))
    val (stagedBad, okBad) = SnapshotTable.writeAuditPublish(spark, dir,
      bad)(df => df.filter(col("claim_id").isNull).isEmpty)
    assert(!okBad)
    // main still points at the base; reading main sees no bad row
    assert(SnapshotTable.getRef(spark, dir, "main").contains(mainBefore))
    val main = SnapshotTable.readRef(spark, dir, "main")
    assert(main.count() == 5)
    assert(main.filter(col("batch_id") === "bad").isEmpty)
    // the staged version remains time-travelable until vacuum
    assert(SnapshotTable.read(spark, dir, Some(stagedBad))
      .filter(col("batch_id") === "bad").count() == 3)
    // audit branch is gone
    assert(SnapshotTable.getRef(spark, dir, "audit").isEmpty)
    val (stagedGood, okGood) = SnapshotTable.writeAuditPublish(spark, dir,
      rows(3, 2, "good"))(df => df.filter(col("claim_id").isNull).isEmpty)
    assert(okGood)
    assert(SnapshotTable.getRef(spark, dir, "main").contains(stagedGood))
    assert(SnapshotTable.readRef(spark, dir, "main")
      .filter(col("batch_id") === "good").count() == 3)
    assert(SnapshotTable.readRef(spark, dir, "main").count() == 8)
  }

  test("schema widening: int -> long resolves from root metadata; v1 time travel never sees a v2 column") {
    val dir = s"$base/widen"
    wipe(dir)
    val v1df = (0 until 4).map(i => (s"K$i", "b1", i, 2000, 1))
      .toDF("claim_id", "batch_id", "qty", "service_year", "service_month")
    assert(v1df.schema("qty").dataType == IntegerType)
    SnapshotTable.append(spark, dir, v1df)
    val v2df = (0 until 3).map(i =>
        (s"L$i", "b2", i.toLong + 5000000000L, 2000, 2, s"src$i"))
      .toDF("claim_id", "batch_id", "qty", "service_year", "service_month",
        "origin")
    SnapshotTable.append(spark, dir, v2df)
    // root schema: qty widened to long, origin appended
    val schema = SnapshotTable.tableSchema(spark, dir).get
    assert(schema("qty").dataType == LongType)
    assert(schema.fieldNames.contains("origin"))
    val latest = SnapshotTable.read(spark, dir)
    assert(latest.schema("qty").dataType == LongType)
    // v1 rows surface origin as NULL; v2's big longs read exactly
    assert(latest.filter(col("origin").isNull).count() == 4)
    assert(latest.filter(col("qty") >= 5000000000L).count() == 3)
    // a v1 TIME-TRAVEL read resolves v1's root schema: no origin column
    val v1read = SnapshotTable.read(spark, dir, Some(1))
    assert(!v1read.schema.fieldNames.contains("origin"))
    assert(v1read.schema("qty").dataType == IntegerType)
    // incompatible change is rejected
    intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, dir,
        Seq(("M0", "b3", "notanumber", 2000, 3))
          .toDF("claim_id", "batch_id", "qty", "service_year",
            "service_month"))
    }
  }

  test("vacuumed history degrades incremental publish to a full republish, never FileNotFoundException") {
    val dir = s"$base/vacfall"
    wipe(dir)
    val t = s"$dir/silver"
    SnapshotTable.append(spark, t, rows(5, 1, "b1"))
    SnapshotTable.overwritePartitions(spark, t, rows(2, 1, "b2"))
    SnapshotTable.overwritePartitions(spark, t, rows(3, 1, "b3"))
    // consumer watermark pinned at v1, whose root vacuum then deletes
    SnapshotTable.vacuum(spark, t, retainLast = 1)
    assert(!new File(s"$t/_snapshots/v00001.txt").exists())
    val parts = SnapshotTable.changedPartitionsBetween(spark, t, 1, 3)
    // history truncated -> every live partition reports changed
    assert(parts == Seq((Some(2000), Some(1))))
    // and the added-files CDC read degrades to the full current content
    assert(SnapshotTable.readFilesAdded(spark, t, 1, 3).count() == 3)
  }

  test("partitionPredicate beyond MaxOrTerms: set-membership form, same semantics, still prunes at listing time") {
    // semantics: OR form and set form agree on every (y, m) + nulls
    val parts = (0 until 70).map(i => (Some(2000 + i / 12), Some(1 + i % 12)))
      .map { case (y, m) => (y: Option[Int], m: Option[Int]) } :+
      ((None: Option[Int]), (None: Option[Int]))
    assert(parts.size > IncrementalGold.MaxOrTerms)
    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("service_year", IntegerType),
      org.apache.spark.sql.types.StructField("service_month", IntegerType)))
    val probeRows = ((0 until 80).map(i =>
        (Integer.valueOf(2000 + i / 12), Integer.valueOf(1 + i % 12))) :+
      ((null: Integer), (null: Integer)))
      .map { case (y, m) => org.apache.spark.sql.Row(y, m) }
    val probe = spark.createDataFrame(
      spark.sparkContext.parallelize(probeRows, 2), probeSchema)
    val expected = probe.filter(
      parts.take(IncrementalGold.MaxOrTerms)
        .map { case (y, m) =>
          (col("service_year") <=> y.map(lit(_)).getOrElse(lit(null)
            .cast("int"))) &&
          (col("service_month") <=> m.map(lit(_)).getOrElse(lit(null)
            .cast("int")))
        }.reduce(_ || _) ||
      parts.drop(IncrementalGold.MaxOrTerms)
        .map { case (y, m) =>
          (col("service_year") <=> y.map(lit(_)).getOrElse(lit(null)
            .cast("int"))) &&
          (col("service_month") <=> m.map(lit(_)).getOrElse(lit(null)
            .cast("int")))
        }.reduce(_ || _)).collect().map(_.toSeq).toSet
    val got = probe.filter(IncrementalGold.partitionPredicate(parts))
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    // pruning: against a 70-partition table, the big-N predicate still
    // reaches the scan as a partition-only filter (listing-time prune)
    val dir = s"$base/bigN"
    wipe(dir)
    (0 until 70).map(i => (s"K$i", 2000 + i / 12, 1 + i % 12))
      .toDF("claim_id", "service_year", "service_month")
      .write.partitionBy("service_year", "service_month").parquet(dir)
    val table = spark.read.parquet(dir)
    val slice = table.filter(
      IncrementalGold.partitionPredicate(parts.take(66)))
    val scan = slice.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    assert(scan.selectedPartitions.partitionCount == 66,
      s"expected 66 selected partitions, got " +
        s"${scan.selectedPartitions.partitionCount}")
  }

  test("metadata row counts: exact under append, overwrite and tier merge; unknown for metadata-only commits") {
    val dir = s"$base/rowcounts"
    wipe(dir)
    (1 to 5).foreach(m => SnapshotTable.append(spark, dir, rows(3, m, s"b$m")))
    assert(SnapshotTable.rowCount(spark, dir).contains(15L))
    // per-partition counts match a real group-by
    val byPart = SnapshotTable.rowCountsByPartition(spark, dir).get
    assert(byPart == (1 to 5).map(m =>
      (Some(2000), Some(m)) -> 3L).toMap)
    // counts survive a copy-on-write overwrite (survivor chunks filter
    // their per-file counts; the replacement chunk collects fresh ones)
    SnapshotTable.overwritePartitions(spark, dir, rows(7, 3, "b3x"))
    assert(SnapshotTable.rowCount(spark, dir).contains(19L))
    assert(SnapshotTable.rowCountsByPartition(spark, dir)
      .get((Some(2000), Some(3))) == 7L)
    // counts survive the tier merge (30 commits force chunk merging)
    (6 to 30).foreach(m =>
      SnapshotTable.append(spark, dir, rows(2, 1 + (m % 12), s"c$m")))
    assert(SnapshotTable.rowCount(spark, dir).contains(19L + 25 * 2))
    // prior versions keep their own counts (version-pinned metadata)
    assert(SnapshotTable.rowCount(spark, dir, Some(5)).contains(15L))
    // a metadata-only commit (no real files) yields UNKNOWN, never zero
    val mDir = s"$base/rowcounts_meta"
    wipe(mDir)
    SnapshotTable.commitFiles(spark, mDir, "seed",
      Seq("service_year=2000/service_month=1/fake.parquet"))
    assert(SnapshotTable.rowCount(spark, mDir).isEmpty)
  }

  test("ANALYZE sidecar: persisted NDV equals the engine KMV estimate over the data; version-pinned; cleaned by truncateTo") {
    val dir = s"$base/analyze"
    wipe(dir)
    // claim_id unique per row; month column has 4 distinct values
    (1 to 4).foreach(m => SnapshotTable.append(spark, dir, rows(40, m, s"b$m")))
    val av = SnapshotTable.analyzeTable(spark, dir,
      Seq("claim_id", "batch_id"))
    assert(av == 4)
    val stats = SnapshotTable.tableStats(spark, dir).get
    assert(stats.analyzedVersion == 4)
    assert(stats.rowCount.contains(160L))
    // batch_id has 4 distinct values < k -> the sketch IS exact
    assert(stats.ndv("batch_id").contains(4.0))
    // claim_id (160 distinct > k=64): the sidecar estimate must equal
    // the engine-standard KMV computed over the live data, bit-exactly
    val expected = operators.SketchOps.kmvDistinct(
        SnapshotTable.read(spark, dir).withColumn("g", lit(1)),
        Seq("g"), col("claim_id"))
      .collect().head.getAs[Double]("kmv_est")
    assert(stats.ndv("claim_id").contains(expected))
    // stats are pinned to their version: a later append does not move
    // them; tableStats serves the most recent sidecar at-or-below
    SnapshotTable.append(spark, dir, rows(10, 5, "b5"))
    assert(SnapshotTable.tableStats(spark, dir).get.analyzedVersion == 4)
    val av2 = SnapshotTable.analyzeTable(spark, dir, Seq("claim_id"))
    assert(av2 == 5)
    assert(SnapshotTable.tableStats(spark, dir).get.rowCount
      .contains(170L))
    assert(SnapshotTable.tableStats(spark, dir, Some(4)).get
      .analyzedVersion == 4)
    // truncateTo drops sidecars above the truncation point
    SnapshotTable.truncateTo(spark, dir, 4)
    assert(SnapshotTable.tableStats(spark, dir).get.analyzedVersion == 4)
    assert(!new File(s"$dir/_snapshots/analyze_v00005.txt").exists())
  }

  test("readCbo: the broadcast decision comes from commit metadata, not Spark's size estimate") {
    val dir = s"$base/cbo"
    wipe(dir)
    val dim = (0 until 6).map(i => (s"K1-$i", s"t${i % 2}"))
      .toDF("claim_id", "tier")
    SnapshotTable.append(spark, dir, dim)
    val fact = (0 until 500).map(i => (s"K1-${i % 6}", i * 1.0))
      .toDF("claim_id", "amount")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // metadata row count (6) is under the threshold -> broadcast,
      // even with Spark's own size-based decision disabled
      val small = fact.join(SnapshotTable.readCbo(spark, dir),
        Seq("claim_id"))
      assert(small.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(small.count() == 500)
      // same table above the threshold -> no hint, no broadcast
      val big = fact.join(
        SnapshotTable.readCbo(spark, dir, broadcastMaxRows = 5),
        Seq("claim_id"))
      assert(!big.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(big.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      threshold)
  }

  test("catalog transactions: atomic cross-table cut; a table commit without its catalog commit stays invisible") {
    import graft.operators.SnapshotCatalog
    import graft.operators.SnapshotCatalog.Pin
    val dir = s"$base/catalog"
    wipe(dir)
    val silver = s"$dir/silver"; val gold = s"$dir/gold"
    val cat = s"$dir/_catalog"
    val sv1 = SnapshotTable.append(spark, silver, rows(6, 1, "b1"))
    val gv1 = SnapshotTable.append(spark, gold, rows(2, 1, "g1"))
    val cv1 = SnapshotCatalog.commit(spark, cat,
      Seq(Pin("silver", silver, sv1), Pin("gold", gold, gv1)))
    assert(cv1 == 1)
    // txn 2 writes BOTH tables, one catalog CAS publishes the pair
    val sv2 = SnapshotTable.append(spark, silver, rows(4, 2, "b2"))
    val gv2 = SnapshotTable.append(spark, gold, rows(3, 2, "g2"))
    val cv2 = SnapshotCatalog.commit(spark, cat,
      Seq(Pin("silver", silver, sv2), Pin("gold", gold, gv2)))
    // each catalog version is a consistent cut
    assert(SnapshotCatalog.readTable(spark, cat, "silver", Some(cv1))
      .count() == 6)
    assert(SnapshotCatalog.readTable(spark, cat, "gold", Some(cv1))
      .count() == 2)
    assert(SnapshotCatalog.readTable(spark, cat, "silver", Some(cv2))
      .count() == 10)
    assert(SnapshotCatalog.readTable(spark, cat, "gold", Some(cv2))
      .count() == 5)
    // the crash shape: silver commits v3 but the transaction dies
    // before its catalog commit — catalog readers still get the v2
    // pair, never silver v3 next to gold v2
    SnapshotTable.append(spark, silver, rows(9, 3, "b3"))
    assert(SnapshotCatalog.pins(spark, cat)("silver").version == sv2)
    assert(SnapshotCatalog.readTable(spark, cat, "silver").count() == 10)
  }

  test("catalog conflicts: same-table repin from a stale read aborts; disjoint-table transactions compose; pins carry forward") {
    import graft.operators.SnapshotCatalog
    import graft.operators.SnapshotCatalog.Pin
    val dir = s"$base/catconflict"
    wipe(dir)
    val a = s"$dir/a"; val b = s"$dir/b"; val cat = s"$dir/_catalog"
    val av1 = SnapshotTable.append(spark, a, rows(3, 1, "a1"))
    val bv1 = SnapshotTable.append(spark, b, rows(3, 1, "b1"))
    val cv1 = SnapshotCatalog.commit(spark, cat,
      Seq(Pin("a", a, av1), Pin("b", b, bv1)))
    // two transactions both read catalog v1; the first repins table a
    val av2 = SnapshotTable.append(spark, a, rows(2, 2, "a2"))
    SnapshotCatalog.commit(spark, cat, Seq(Pin("a", a, av2)),
      readVersion = Some(cv1))
    // the second also wants to repin a from the SAME stale read — its
    // writes were computed against pins that no longer hold
    val ex = intercept[SnapshotConflictException] {
      SnapshotCatalog.commit(spark, cat, Seq(Pin("a", a, 99)),
        readVersion = Some(cv1))
    }
    assert(ex.getMessage.contains("recompute"))
    // but a DISJOINT-table transaction from the same stale read
    // composes fine, and a's pin carries forward untouched
    val bv2 = SnapshotTable.append(spark, b, rows(1, 2, "b2"))
    val cv3 = SnapshotCatalog.commit(spark, cat, Seq(Pin("b", b, bv2)),
      readVersion = Some(cv1))
    val p = SnapshotCatalog.pins(spark, cat, Some(cv3))
    assert(p("a").version == av2 && p("b").version == bv2)
  }

  test("catalog write-audit-publish: a failing cross-table cut rolls back (main and latest restored); a passing one fast-forwards main") {
    import graft.operators.SnapshotCatalog
    import graft.operators.SnapshotCatalog.Pin
    val dir = s"$base/catwap"
    wipe(dir)
    val a = s"$dir/a"; val b = s"$dir/b"; val cat = s"$dir/_catalog"
    SnapshotTable.append(spark, a, rows(4, 1, "a1"))
    SnapshotTable.append(spark, b, rows(2, 1, "b1"))
    SnapshotCatalog.commit(spark, cat,
      Seq(Pin("a", a, 1), Pin("b", b, 1)))
    SnapshotCatalog.setRef(spark, cat, "main", 1)
    SnapshotTable.append(spark, a, rows(3, 2, "a2")) // a v2 staged
    // audit demands the cut pins BOTH tables at the same generation —
    // the a-only repin fails, catalog rolls back, main never moves
    def pairAudit(cv: Int): Boolean = {
      val p = SnapshotCatalog.pins(spark, cat, Some(cv))
      p("a").version == p("b").version
    }
    val (stagedBad, okBad) = SnapshotCatalog.writeAuditPublish(spark, cat,
      Seq(Pin("a", a, 2)))(pairAudit)
    assert(!okBad)
    assert(SnapshotCatalog.getRef(spark, cat, "main").contains(1))
    // the rollback commit restored main's pins for followers of latest
    assert(SnapshotCatalog.pins(spark, cat)("a").version == 1)
    // the staged cut stays inspectable until catalog vacuum
    assert(SnapshotCatalog.pins(spark, cat, Some(stagedBad))("a")
      .version == 2)
    assert(SnapshotCatalog.getRef(spark, cat, "audit").isEmpty)
    // the complete pair passes and main fast-forwards to it
    SnapshotTable.append(spark, b, rows(1, 2, "b2")) // b v2
    val (stagedGood, okGood) = SnapshotCatalog.writeAuditPublish(spark,
      cat, Seq(Pin("a", a, 2), Pin("b", b, 2)))(pairAudit)
    assert(okGood)
    assert(SnapshotCatalog.getRef(spark, cat, "main").contains(stagedGood))
    assert(SnapshotCatalog.readTable(spark, cat, "a",
      SnapshotCatalog.getRef(spark, cat, "main")).count() == 7)
  }

  test("catalog-aware vacuum: retained catalog cuts keep their pinned table versions readable; unpinned history reclaims") {
    import graft.operators.SnapshotCatalog
    import graft.operators.SnapshotCatalog.Pin
    val dir = s"$base/catvacuum"
    wipe(dir)
    val t = s"$dir/t"; val cat = s"$dir/_catalog"
    // three catalog cuts pin t@1, t@3, t@5 (v2/v4 never pinned)
    val vs = (1 to 5).map(m => SnapshotTable.append(spark, t,
      rows(2 + m, m, s"b$m")))
    SnapshotCatalog.commit(spark, cat, Seq(Pin("t", t, vs(0))))
    SnapshotCatalog.commit(spark, cat, Seq(Pin("t", t, vs(2))))
    SnapshotCatalog.commit(spark, cat, Seq(Pin("t", t, vs(4))))
    // retain the last TWO catalog cuts: t@3 and t@5 must stay readable
    // even though a bare table vacuum(retainLast=1) would keep only v5
    SnapshotCatalog.vacuum(spark, cat, retainLast = 2)
    assert(SnapshotCatalog.latestVersion(spark, cat) == 3)
    assert(SnapshotCatalog.pins(spark, cat, Some(2))("t").version == vs(2))
    assert(SnapshotCatalog.readTable(spark, cat, "t", Some(2))
      .count() == (1 to 3).map(m => 2L + m).sum)
    assert(SnapshotCatalog.readTable(spark, cat, "t", Some(3))
      .count() == (1 to 5).map(m => 2L + m).sum)
    // the dropped catalog cut's pin (t@1) is reclaimed: both the
    // catalog root and the table root are gone
    assert(!new File(f"$t/_snapshots/v00001.txt").exists())
    intercept[java.io.FileNotFoundException] {
      SnapshotCatalog.pins(spark, cat, Some(1))
    }
  }

  test("z-order clustering: one layout prunes on BOTH dimensions; sort order recorded; content preserved") {
    import spark.implicits._
    val dir = s"$base/zorder"
    wipe(dir)
    // two independent dimensions spread over one partition: amount
    // grows with i, day cycles — z-ordering must make BOTH selective
    val df = (0 until 4000).map { i =>
      (s"Z$i", java.sql.Date.valueOf(f"2000-01-${1 + i % 28}%02d"),
        i * 10.0, 2000, 1)
    }.toDF("claim_id", "service_date", "claim_amount", "service_year",
      "service_month")
    SnapshotTable.append(spark, dir, df)
    val contentBefore = SnapshotTable.read(spark, dir)
      .collect().map(_.toSeq).toSet
    SnapshotTable.clusterZOrder(spark, dir,
      Seq("service_date", "claim_amount"), rangeGroups = 16)
    assert(SnapshotTable.commitMeta(spark, dir)("sortorder") ==
      "zorder(service_date,claim_amount)")
    assert(SnapshotTable.read(spark, dir).collect().map(_.toSeq).toSet
      == contentBefore, "clustering must not change content")
    // a narrow 2-D probe: each single-dimension predicate must prune
    // on its own, and the composed probe at least as hard
    val (_, total, keptDate) = SnapshotTable.planScan(spark, dir, None,
      Seq(SnapshotTable.ZonePredicate.str("service_date",
        "2000-01-03", "2000-01-06")))
    val (_, _, keptAmt) = SnapshotTable.planScan(spark, dir, None,
      Seq(SnapshotTable.ZonePredicate.num("claim_amount", 100.0, 4000.0)))
    val (df2, _, keptBoth) = SnapshotTable.planScan(spark, dir, None,
      Seq(SnapshotTable.ZonePredicate.str("service_date",
          "2000-01-03", "2000-01-06"),
        SnapshotTable.ZonePredicate.num("claim_amount", 100.0, 4000.0)))
    assert(total >= 16, s"need enough files to prune meaningfully: $total")
    assert(keptDate < total, s"date pruning must engage: $keptDate/$total")
    assert(keptAmt < total, s"amount pruning must engage: $keptAmt/$total")
    assert(keptBoth <= math.min(keptDate, keptAmt))
    // lossless: the pruned scan holds every qualifying row
    val got = df2.filter(col("service_date").between(
        "2000-01-03", "2000-01-06") &&
      col("claim_amount").between(100.0, 4000.0)).count()
    val want = SnapshotTable.read(spark, dir).filter(
      col("service_date").between("2000-01-03", "2000-01-06") &&
      col("claim_amount").between(100.0, 4000.0)).count()
    assert(got == want && want > 0)
    // Z-ORDER ON WRITE: the curve's boundaries are commit metadata...
    assert(SnapshotTable.commitMeta(spark, dir).keys
      .count(_.startsWith("zorder.bounds.")) == 2)
    // ...so an ORDINARY append clusters against the same curve: its
    // amounts live in a band (50k+) the earlier probe excludes, so the
    // probe must keep skipping — the appended files carry their own
    // zone maps without the caller passing statsColumns
    val appended = (0 until 2000).map { i =>
      (s"W$i", java.sql.Date.valueOf(f"2000-01-${1 + i % 28}%02d"),
        50000.0 + i * 10.0, 2000, 1)
    }.toDF("claim_id", "service_date", "claim_amount", "service_year",
      "service_month")
    SnapshotTable.append(spark, dir, appended)
    val (_, totalNow, keptAmtNow) = SnapshotTable.planScan(spark, dir, None,
      Seq(SnapshotTable.ZonePredicate.num("claim_amount", 100.0, 4000.0)))
    assert(totalNow > total, "append must add files")
    assert(keptAmtNow == keptAmt,
      s"appended out-of-band files must all be skipped " +
        s"($keptAmtNow vs $keptAmt)")
    // and WITHIN the appended band, date pruning engages on the new
    // files too (they were z-clustered on write)
    val (_, _, keptInBand) = SnapshotTable.planScan(spark, dir, None,
      Seq(SnapshotTable.ZonePredicate.num("claim_amount", 50000.0, 1e9),
        SnapshotTable.ZonePredicate.str("service_date",
          "2000-01-03", "2000-01-04")))
    assert(keptInBand < totalNow - total,
      s"date pruning must engage on appended files: $keptInBand of " +
        s"${totalNow - total}")
    // lossless across both write paths
    val (df3, _, _) = SnapshotTable.planScan(spark, dir, None,
      Seq(SnapshotTable.ZonePredicate.num("claim_amount", 50000.0, 52000.0)))
    assert(df3.filter(col("claim_amount").between(50000.0, 52000.0))
      .count() == SnapshotTable.read(spark, dir)
      .filter(col("claim_amount").between(50000.0, 52000.0)).count())
  }

  test("streamAppend is exactly-once: replayed batch ids skip; watermarks carry across other writers' commits; sinks are independent") {
    val dir = s"$base/streamsink"
    wipe(dir)
    assert(SnapshotTable.streamAppend(spark, dir, rows(3, 1, "s0"),
      "sinkA", 0L).contains(1))
    // foreachBatch replay of batch 0: metadata-checked no-op
    assert(SnapshotTable.streamAppend(spark, dir, rows(3, 1, "s0"),
      "sinkA", 0L).isEmpty)
    assert(SnapshotTable.read(spark, dir).count() == 3)
    // an UNRELATED writer commits in between — the watermark carries
    // forward through its root, so the replay check stays O(1) and true
    SnapshotTable.append(spark, dir, rows(2, 2, "other"))
    assert(SnapshotTable.lastStreamBatch(spark, dir, "sinkA").contains(0L))
    assert(SnapshotTable.streamAppend(spark, dir, rows(3, 1, "s0"),
      "sinkA", 0L).isEmpty)
    // the next batch commits; a SECOND sink has its own watermark line
    assert(SnapshotTable.streamAppend(spark, dir, rows(4, 3, "s1"),
      "sinkA", 1L).nonEmpty)
    assert(SnapshotTable.streamAppend(spark, dir, rows(1, 4, "t0"),
      "sinkB", 0L).nonEmpty)
    assert(SnapshotTable.lastStreamBatch(spark, dir, "sinkA").contains(1L))
    assert(SnapshotTable.lastStreamBatch(spark, dir, "sinkB").contains(0L))
    assert(SnapshotTable.read(spark, dir).count() == 3 + 2 + 4 + 1)
  }

  test("partition evolution: metadata-only spec switch; old files keep their layout; reads and partition-scoped commits span both specs") {
    import spark.implicits._
    val dir = s"$base/pevolve"
    wipe(dir)
    def dayRows(n: Int, month: Int, batch: String) =
      (0 until n).map(i => (s"D$month-$i", batch, i * 1.0, 2000, month,
        1 + i % 3)).toDF("claim_id", "batch_id", "claim_amount",
        "service_year", "service_month", "service_day")
    // v1: month-grain spec (the default) — service_day stays in DATA
    SnapshotTable.append(spark, dir, dayRows(6, 1, "b1"))
    assert(SnapshotTable.manifest(spark, dir, 1).files
      .forall(!_.contains("service_day=")))
    // v2: evolve to day grain — METADATA-ONLY (no file moves, content
    // byte-identical), and only refinements of year/month are legal
    val filesBefore = dataFiles(dir)
    SnapshotTable.evolvePartitions(spark, dir,
      Seq("service_year", "service_month", "service_day"))
    assert(dataFiles(dir) == filesBefore)
    intercept[IllegalArgumentException] {
      SnapshotTable.evolvePartitions(spark, dir, Seq("service_day"))
    }
    // v3: a post-evolution append writes day directories
    SnapshotTable.append(spark, dir, dayRows(6, 2, "b2"))
    val v3files = SnapshotTable.manifest(spark, dir, 3).files
    assert(v3files.exists(_.contains("service_day=")))
    assert(v3files.count(!_.contains("service_day=")) ==
      SnapshotTable.manifest(spark, dir, 1).files.size)
    // the read spans both specs: month-spec rows carry service_day
    // from data, day-spec rows from the path — one frame, same schema
    val all = SnapshotTable.read(spark, dir)
    assert(all.count() == 12)
    assert(all.filter(col("service_day").isNull).isEmpty)
    assert(all.filter(col("service_month") === 2 &&
      col("service_day") === 1).count() == 2)
    // partition-scoped ops keep working across specs (day dirs nest
    // under the year/month prefix): overwrite month 2 drops day files
    SnapshotTable.overwritePartitions(spark, dir, dayRows(2, 2, "b2x"))
    val v4 = SnapshotTable.read(spark, dir)
    assert(v4.filter(col("service_month") === 2).count() == 2)
    assert(v4.count() == 8)
    // metadata row counts survive spec evolution
    assert(SnapshotTable.rowCount(spark, dir).contains(8L))
    // time travel to the pre-evolution version still reads
    assert(SnapshotTable.read(spark, dir, Some(1)).count() == 6)
  }

  test("hidden partitioning: a date-range scan derives its partition pruning from the transform, composed with date zones") {
    import spark.implicits._
    val dir = s"$base/hidden"
    wipe(dir)
    def datedRows(month: Int) = (0 until 10).map { i =>
      (s"H$month-$i", java.sql.Date.valueOf(f"2000-$month%02d-${1 + i}%02d"),
        2000, month)
    }.toDF("claim_id", "service_date", "service_year", "service_month")
    (1 to 6).foreach(m => SnapshotTable.append(spark, dir, datedRows(m),
      statsColumns = Seq("service_date")))
    // a row predicated only on the DATA column: the planner enumerates
    // the covering (year, month) partitions itself and composes the
    // date zone maps — no partition column in the caller's sight
    val (df, total, kept) = SnapshotTable.planScanByDate(spark, dir,
      "service_date", "2000-02-03", "2000-03-31")
    assert(total > kept, s"pruning must engage: $kept/$total")
    val rows = df.filter(col("service_date") >= lit("2000-02-03") &&
      col("service_date") <= lit("2000-03-31"))
    assert(rows.count() == 8 + 10) // Feb 3..10 + all of March
    // the pruned file set only spans months 2-3
    val got = df.select(col("service_month")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(got == Set(2, 3), s"read months $got")
  }

  test("hidden partitioning under a day-grain spec: partial-month files prune by their service_day path segment alone (no zone stats needed)") {
    import spark.implicits._
    val dir = s"$base/hidden_day"
    wipe(dir)
    // day-grain spec from the start; commit WITHOUT date zone stats so
    // any sub-month pruning must come from the PATH
    SnapshotTable.append(spark, dir,
      (0 until 3).map(i => (s"seed$i", 2000, 1, 1))
        .toDF("claim_id", "service_year", "service_month", "service_day"))
    SnapshotTable.evolvePartitions(spark, dir,
      Seq("service_year", "service_month", "service_day"))
    val days = (1 to 20).flatMap(d => (0 until 2).map(i =>
      (s"D$d-$i", java.sql.Date.valueOf(f"2000-02-$d%02d"), 2000, 2, d)))
      .toDF("claim_id", "service_date", "service_year", "service_month",
        "service_day")
    SnapshotTable.append(spark, dir,
      days.repartition(col("service_day")))
    // the range covers Feb 5..9 only: day files outside prune by path
    val (df, total, kept) = SnapshotTable.planScanByDate(spark, dir,
      "service_date", "2000-02-05", "2000-02-09")
    val dayFiles = SnapshotTable.manifest(spark, dir,
      SnapshotTable.latestVersion(spark, dir)).files
      .count(_.contains("service_day="))
    assert(dayFiles >= 20, s"need day-grain files to prune: $dayFiles")
    assert(kept < total, s"day-path pruning must engage: $kept/$total")
    // lossless AND tight: exactly the 5 in-range days' rows
    assert(df.filter(col("service_date").between("2000-02-05",
      "2000-02-09")).count() == 10)
    val got = df.select(col("service_day")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(got.subsetOf((5 to 9).toSet),
      s"out-of-range day files must be skipped, read days $got")
  }

  test("truncateTo resets the table to a version: later roots, chunks, files and refs gone; content restored") {
    val dir = s"$base/trunc"
    wipe(dir)
    SnapshotTable.append(spark, dir, rows(5, 1, "b1"))
    SnapshotTable.append(spark, dir, rows(3, 2, "b2"))
    SnapshotTable.setRef(spark, dir, "main", 2)
    val filesV1 = SnapshotTable.manifest(spark, dir, 1).files.toSet
    SnapshotTable.truncateTo(spark, dir, 1)
    assert(SnapshotTable.latestVersion(spark, dir) == 1)
    assert(dataFiles(dir) == filesV1, "v2-only files must be deleted")
    assert(SnapshotTable.getRef(spark, dir, "main").isEmpty,
      "refs above the truncation point must drop")
    assert(SnapshotTable.read(spark, dir).count() == 5)
  }
}
