package graft.operators

import java.security.MessageDigest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared discipline for PERSISTED model artifacts (IVF-PQ indices,
  * sketch register/counter tables): a versioned directory whose name
  * binds the artifact to (a) the training-code version, (b) every
  * training parameter, and (c) the SOURCE DATA — so a lookup can never
  * silently serve a model trained on other data (round-10 ADVICE: a
  * leaf-name-only key confused /a/sf1 with /b/sf1 and missed in-place
  * fixture edits).
  *
  * The data binding is [[corpusFingerprint]]: an md5 over the source's
  * ABSOLUTE path plus every file's (name, length, mtime). Metadata-only
  * — a driver-side listing (the same listing the scan's file index
  * does), no data scan, so the lookup stays O(files) however large the
  * corpus. mtime+length catches in-place rewrites; the absolute path
  * catches same-leaf different-dataset collisions. A byte-identical
  * copy at a new path re-fingerprints and retrains — the safe
  * direction (a stale hit is silent corruption; a spurious miss is one
  * redundant build).
  */
object ModelStore {

  /** 12-hex-char fingerprint of the data under `dataPath` (a file or a
    * directory tree root). Deterministic for unchanged data; changes
    * whenever any file is added, removed, resized, or rewritten. */
  def corpusFingerprint(spark: SparkSession, dataPath: String): String = {
    val p = new Path(dataPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(p)
    val files =
      if (!fs.exists(q)) Array.empty[(String, Long, Long)]
      else {
        val it = fs.listFiles(q, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        while (it.hasNext) {
          val s = it.next()
          buf += ((s.getPath.toString, s.getLen, s.getModificationTime))
        }
        buf.toArray
      }
    val md = MessageDigest.getInstance("MD5")
    md.update(q.toString.getBytes("UTF-8"))
    files.sortBy(_._1).foreach { case (n, len, mt) =>
      md.update(s"|$n:$len:$mt".getBytes("UTF-8"))
    }
    md.digest().take(6).map(b => f"$b%02x").mkString
  }
}
