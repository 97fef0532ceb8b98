package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: Bench's methodology (warmup + min-of-3 noop-sink runs,
  * staged-block cleanup outside the timing) over a SUBSET of queries —
  * the scale-rehearsal harness. A full Bench at sf1 costs ~1.5 h wall;
  * the scale report (tools/scale_report.py) only needs the heavy
  * queries' exponents, so this times exactly the named ones and prints
  * the same one-line JSON shape Bench does (scale_report.py parses it
  * unchanged). NEVER used by the driver contract — graft.Bench remains
  * the only benchmark entry point and still times every query.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *          runMain graft.ScaleBench <q_name> [q_name ...]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleBench <q_name> [q_name ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val names = args.toSeq.filter { n =>
      val ok = SparkEntry.queries.contains(n)
      if (!ok) System.err.println(s"[scalebench] unknown query $n — skipped")
      ok
    }
    // warmup pass (untimed) — fixture caches build here
    names.foreach { n =>
      try run(SparkEntry.queries(n)) catch { case _: Throwable => () }
      finally Engine.clearStaged(spark, blocking = true)
    }
    val results = names.map { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(SparkEntry.queries(n)); true } catch {
          case e: Throwable =>
            System.err.println(s"[scalebench] $n FAILED: $e"); false
        }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        Engine.clearStaged(spark, blocking = true)
        dt
      }
      n -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // errors/controls keys kept for tools/scale_report.py compatibility
    val errJson = results.filter(_._2 < 0).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"controls":[],"sf":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target/scalebench.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
