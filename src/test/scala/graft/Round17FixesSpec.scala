package graft

import java.io.File
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SnapshotTable

/** Round-17 pins, headline: CHANGE-FEED ORDERING ACROSS SUB-WINDOWS.
  * Before this round [[SnapshotTable.changeRowsOrRecompute]]'s unioned
  * sub-feeds carried no ordering, and [[SnapshotTable.applyChangeFeed]]
  * re-added every insert key after the delete ref — so a key inserted
  * BEFORE a rewrite and deleted AFTER it was resurrected on the mirror
  * whenever its partition escaped the recompute manifest. Sub-feeds
  * now stamp `_commit_version` with their sub-range's end version and
  * the apply path resolves latest-marker-per-key ACROSS change types.
  * Also pinned here: the root cache's per-commit `uid` content token
  * (a forged same-length same-mtime recommit observes the fresh root),
  * caller-persisted feeds surviving applyChangeFeed, and the batched
  * listStatus length lookup failing with the vanished file's full
  * path.
  */
class Round17FixesSpec extends SparkSpec {

  import spark.implicits._

  private val base = "target/test_round17_fixes"

  private def wipe(dir: String): Unit = {
    def del(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del); f.delete()
    }
    val root = new File(dir)
    if (root.exists()) del(root)
  }

  private def rows(ks: Seq[String], batch: String, amt: Double,
      month: Int = 1) =
    ks.map(k => (k, batch, amt, 2000, month))
      .toDF("claim_id", "batch_id", "claim_amount", "service_year",
        "service_month")

  private def content(dir: String): Set[(String, String)] =
    SnapshotTable.read(spark, dir)
      .select(col("claim_id"), col("batch_id"))
      .as[(String, String)].collect().toSet

  test("a key inserted before a rewrite and deleted after it stays deleted on the mirror") {
    import SnapshotTable._
    val dir = s"$base/resurrect"
    val mirror = s"$base/resurrect_mirror"
    wipe(dir); wipe(mirror)
    // v1 bootstrap: partition P=(2000,1) and Q=(2000,2) both populated
    append(spark, dir, rows(Seq("A", "B"), "b1", 1.0, month = 1)
      .unionByName(rows(Seq("K"), "b1", 1.0, month = 2)))
    append(spark, dir, rows(Seq("X"), "b2", 2.0, month = 1)) // v2: X in P
    compactPartitions(spark, dir, Seq((Some(2000), Some(2)))) // v3: rewrite touches ONLY Q
    deleteKeysMor(spark, dir, Seq("X").toDF("claim_id")) // v4: X deleted
    val cs = changeRowsOrRecompute(spark, dir, 1, 4)
    // the rewrite's recompute manifest covers Q only — X's fate rides
    // entirely on the row feed's ordering
    assert(cs.recomputeParts == Seq((Some(2000), Some(2))))
    val feed = cs.rows.get
    assert(feed.columns.contains("_commit_version"),
      "sub-feeds must be stamped for cross-sub-window ordering")
    // the union really does carry both markers for X
    assert(feed.filter(col("claim_id") === "X")
      .select(col("_change_type")).as[String].collect().toSet ==
      Set("insert", "delete"))
    append(spark, mirror, read(spark, dir, Some(1)))
    applyChangeFeed(spark, mirror, feed, key = "claim_id")
    cs.recompute.foreach(rc =>
      overwritePartitions(spark, mirror, rc, Some(cs.recomputeParts)))
    assert(content(mirror) == content(dir),
      "mirror must converge to the source")
    assert(!content(mirror).exists(_._1 == "X"),
      "deleted key X must NOT be resurrected by its pre-rewrite insert")
  }

  test("applyChangeFeed: an update's same-version delete+insert keeps the insert") {
    import SnapshotTable._
    val mir = s"$base/tie"
    wipe(mir)
    append(spark, mir, rows(Seq("A"), "b1", 1.0))
    // one commit's pre-image + post-image — same _commit_version
    val feed = rows(Seq("A"), "b1", 1.0)
      .withColumn("_change_type", lit("delete"))
      .withColumn("_commit_version", lit(7))
      .unionByName(rows(Seq("A"), "b2", 2.0)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(7)))
    applyChangeFeed(spark, mir, feed, key = "claim_id")
    assert(content(mir) == Set(("A", "b2")), "ties are updates: insert wins")
  }

  test("applyChangeFeed: a newer delete beats an older insert; a newer insert beats an older delete") {
    import SnapshotTable._
    val mir = s"$base/order"
    wipe(mir)
    append(spark, mir, rows(Seq("Z"), "b0", 0.5))
    def marker(k: String, batch: String, t: String, v: Int) =
      rows(Seq(k), batch, 1.0).withColumn("_change_type", lit(t))
        .withColumn("_commit_version", lit(v))
    val feed = marker("P", "b1", "insert", 2)
      .unionByName(marker("P", "b1", "delete", 5))
      .unionByName(marker("Q", "b1", "delete", 2))
      .unionByName(marker("Q", "b2", "insert", 5))
    applyChangeFeed(spark, mir, feed, key = "claim_id")
    assert(content(mir) == Set(("Z", "b0"), ("Q", "b2")),
      "P (latest marker delete) gone; Q (latest marker insert) present")
  }

  test("root cache: a forged same-length same-mtime recommit observes the fresh root") {
    val dir = s"$base/forge"
    wipe(dir)
    SnapshotTable.append(spark, dir, rows(Seq("A"), "b1", 1.0)) // v1
    assert(SnapshotTable.manifest(spark, dir, 1).op == "append") // cache warm
    val p = new File(f"$dir/_snapshots/v${1}%05d.txt")
    val mtime = p.lastModified()
    val text = new String(java.nio.file.Files.readAllBytes(p.toPath), "UTF-8")
    // forge: new uid (same 36-char length), op mutated at same length —
    // byte length and mtime both match the cached token
    val forged = text
      .replaceFirst("uid=[0-9a-f-]{36}",
        s"uid=${java.util.UUID.randomUUID()}")
      .replace("op=append", "op=zppend")
    assert(forged.getBytes("UTF-8").length == text.getBytes("UTF-8").length)
    java.nio.file.Files.write(p.toPath, forged.getBytes("UTF-8"))
    assert(p.setLastModified(mtime))
    assert(SnapshotTable.manifest(spark, dir, 1).op == "zppend",
      "the uid token must reject the stale cached parse")
  }

  test("applyChangeFeed leaves a caller-persisted feed cached") {
    import SnapshotTable._
    val mir = s"$base/persist"
    wipe(mir)
    append(spark, mir, rows(Seq("A"), "b1", 1.0))
    val feed = rows(Seq("B"), "b2", 2.0)
      .withColumn("_change_type", lit("insert"))
    feed.persist()
    try {
      applyChangeFeed(spark, mir, feed, key = "claim_id")
      assert(feed.storageLevel !=
        org.apache.spark.storage.StorageLevel.NONE,
        "applyChangeFeed must not evict the caller's own cache")
    } finally feed.unpersist(true)
  }

  test("opt-out writers stay bounded at volume: merge rewrites <= rangeGroups files; compaction folds, never fans out") {
    import SnapshotTable._
    val dir = s"$base/optout"
    wipe(dir)
    def shaped(b: Int, ids: org.apache.spark.sql.Dataset[java.lang.Long]) =
      ids.select(
        concat(lit("K"), lpad(col("id").cast("string"), 9, "0"))
          .as("claim_id"),
        lit(f"b$b%02d").as("batch_id"),
        (col("id") % 1000).cast("double").as("claim_amount"),
        lit(2000).as("service_year"), lit(1).as("service_month"))
    (0 until 8).foreach(b => append(spark, dir,
      shaped(b, spark.range(b * 50000L, (b + 1) * 50000L)),
      statsColumns = Seq("claim_id")))
    val v0 = latestVersion(spark, dir)
    val before = manifest(spark, dir, v0).files.toSet
    assert(before.size >= 8)
    // a COW merge whose update keys spread over EVERY file — the
    // key-range-clustered rewrite path (rebalance = false) must still
    // land at most rangeGroups(+1 slack) files however many it rewrote
    val upd = shaped(99, spark.range(0L, 400000L, 97L))
    merge(spark, dir, upd)
    val v1 = latestVersion(spark, dir)
    val added = manifest(spark, dir, v1).files.filterNot(before)
    assert(added.nonEmpty && added.size <= 4 + 1,
      s"merge rewrite fanned out to ${added.size} files")
    // maintenance compaction must FOLD the partition (bounded output),
    // never re-emit per-input-file shrapnel
    val preCount = manifest(spark, dir, v1).files
      .count(_.startsWith("service_year=2000/service_month=1/"))
    autoCompact(spark, dir, maxFiles = 2)
    val post = manifest(spark, dir, latestVersion(spark, dir)).files
      .count(_.startsWith("service_year=2000/service_month=1/"))
    assert(post < preCount && post <= 2,
      s"compaction left $post files (was $preCount)")
    assert(read(spark, dir).count() == 400000L)
  }

  test("SQL table functions reach time travel, CDC and the pruned read") {
    import org.apache.spark.sql.SparkSession
    val dir = s"$base/tvf"
    wipe(dir)
    SnapshotTable.append(spark, dir, rows(Seq("A", "B"), "b1", 1.0)) // v1
    SnapshotTable.mergeMor(spark, dir, rows(Seq("B", "C"), "b2", 2.0)) // v2
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      Engine.configure(ext)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("claim_id", "batch_id").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      // time travel: latest, explicit version — each row-identical to
      // its Scala twin
      assert(canon(ext.sql(s"SELECT * FROM graft_table_at('$dir')")) ==
        canon(SnapshotTable.read(ext, dir)))
      assert(canon(ext.sql(s"SELECT * FROM graft_table_at('$dir', 1)")) ==
        Set(("A", "b1"), ("B", "b1")))
      // as-of a timestamp covering the whole history: resolves latest
      assert(canon(ext.sql(
        s"SELECT * FROM graft_table_at('$dir', '2099-01-01 00:00:00')"))
        == canon(SnapshotTable.read(ext, dir)))
      // the change feed, with markers
      val changes = ext.sql(
        s"SELECT claim_id, _change_type FROM graft_table_changes('$dir', 1, 2)")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(changes == Set(("B", "insert"), ("C", "insert"),
        ("B", "delete")))
      // the pruned read: predicate applies row-level too
      assert(canon(ext.sql(
        s"""SELECT * FROM graft_read_where('$dir', "claim_id = 'C'")"""))
        == Set(("C", "b2")))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("streaming source names the full path of a file vanished before listing") {
    val dir = s"$base/vanish"
    val io = s"$base/vanish_io"
    wipe(dir); wipe(io)
    SnapshotTable.append(spark, dir, rows(Seq("A"), "b1", 1.0))
    val rel = SnapshotTable.manifest(spark, dir, 1).files.head
    assert(new File(s"$dir/$rel").delete())
    val q = spark.readStream.format("graft-snapshot")
      .option("path", dir).load()
      .writeStream.format("parquet")
      .option("path", s"$io/out").option("checkpointLocation", s"$io/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q.awaitTermination() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] &&
        c.getMessage.contains(rel)),
      s"expected FileNotFoundException naming $rel, got: $e")
  }
}
