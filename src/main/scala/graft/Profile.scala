package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: explain + time one SparkEntry query.
  *
  * Usage: runMain graft.Profile <query_name> [sfDir]
  * Prints the formatted physical plan and the timed noop-sink execution
  * (same materialization as Bench) — the feedback loop for plan tuning.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_provider_performance")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // same lifecycle as Bench: staged blocks freed OUTSIDE the timing
      Engine.clearStaged(spark, blocking = true)
      dt
    }
    println(s"[profile] $name @ $sfDir")
    fn(spark, sfDir).explain("formatted")
    run() // warmup
    println(f"[profile] timed: ${run()}%.3f s (second run: ${run()}%.3f s)")
    spark.stop()
  }
}
