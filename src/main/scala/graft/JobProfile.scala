package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: where does one query's wall-clock go?
  *
  * Usage: runMain graft.JobProfile <query_name> [sfDir]
  *
  * Registers a SparkListener and runs the query once warm, once timed
  * (same noop-sink materialization as Bench), then prints:
  *  - every Spark job with relative start/duration and call site (the
  *    line of engine code that triggered it), gaps > 150 ms flagged;
  *  - per-callsite totals;
  *  - a poor-man's driver profile: the query thread's stack is sampled
  *    every 25 ms, samples falling OUTSIDE any job interval (pure
  *    driver time — metadata ops, planning, commit machinery, fs ops)
  *    are collapsed to their deepest graft.* frame and counted.
  * The fixture-heavy lifecycle queries spend half their wall in such
  * driver work; this ranks it for optimization.
  */
object JobProfile {
  private final case class JobRec(id: Int, site: String, start: Long,
    var end: Long = -1L)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_snapshot_merge_mor")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("unknown")
        jobs.put(j.jobId, JobRec(j.jobId, site, j.time))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val r = jobs.get(j.jobId)
        if (r != null) r.end = j.time
      }
    }

    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Engine.clearStaged(spark, blocking = true)
      dt
    }
    run() // warmup (fixture cache build lands here)
    jobs.clear()
    spark.sparkContext.addSparkListener(listener)

    // driver stack sampler: the query runs on THIS thread
    val me = Thread.currentThread()
    val samples =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = me.getStackTrace
        // deepest graft frame below JobProfile itself, else the top
        // non-java frame — enough to name the driver phase
        val frame = st.find(f =>
          f.getClassName.startsWith("graft.") &&
            !f.getClassName.contains("JobProfile"))
          .orElse(st.headOption)
          .map(f => s"${f.getClassName.stripPrefix("graft.")}." +
            s"${f.getMethodName}:${f.getLineNumber}")
          .getOrElse("?")
        // also record the top spark/hadoop frame for context
        val top = st.find(f =>
          !f.getClassName.startsWith("java.") &&
            !f.getClassName.startsWith("jdk.") &&
            !f.getClassName.startsWith("scala."))
          .map(f => f.getClassName.split("\\.").takeRight(2).mkString(".") +
            s".${f.getMethodName}")
          .getOrElse("?")
        samples.add((System.currentTimeMillis(), s"$frame  <$top>"))
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val wallStart = System.currentTimeMillis()
    val wall = run()
    sampling = false
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300)

    import scala.jdk.CollectionConverters._
    val recs = jobs.values.asScala.toSeq.filter(_.end > 0).sortBy(_.start)
    println(f"[jobprofile] $name wall=${wall}%.3f s, jobs=${recs.size}")
    // timeline with gaps
    var prevEnd = wallStart
    recs.foreach { r =>
      val gap = r.start - prevEnd
      if (gap > 150)
        println(f"[jobprofile]   -- driver gap ${gap / 1e3}%6.3f s --")
      println(f"[jobprofile]   +${(r.start - wallStart) / 1e3}%7.3f " +
        f"${(r.end - r.start) / 1e3}%7.3f s  job ${r.id}%3d  ${r.site}")
      prevEnd = math.max(prevEnd, r.end)
    }
    val bySite = recs.groupBy(_.site).map { case (s, rs) =>
      (s, rs.map(r => r.end - r.start).sum / 1e3, rs.size)
    }.toSeq.sortBy(-_._2)
    bySite.foreach { case (site, sec, n) =>
      println(f"[jobprofile] site ${sec}%8.3f s  ${n}%4d jobs  $site")
    }
    // driver samples outside any job interval
    val iv = recs.map(r => (r.start, r.end))
    val gapSamples = samples.asScala.toSeq.filter { case (t, _) =>
      !iv.exists { case (s, e) => t >= s && t <= e }
    }
    val byFrame = gapSamples.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy(-_._2).take(25)
    println(s"[jobprofile] driver-gap samples: ${gapSamples.size} x 25 ms")
    byFrame.foreach { case (f, n) =>
      println(f"[jobprofile]   ${n * 0.025}%7.3f s  $f")
    }
    spark.stop()
  }
}
