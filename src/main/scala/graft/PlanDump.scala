package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for a list of queries to
  * files — the plan-evidence artifact the optimization rounds commit
  * under `plans/rNN/`.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [query ...]
  * (no query list = every SparkEntry query). Writes
  * `<outDir>/<query>_<suffix>.txt`. NOTE: building the frame runs the
  * e2e fixture mutations for lifecycle queries, so the dumped plan is
  * the final frame's — the per-commit machinery those queries spend
  * their time in is profiled by [[JobProfile]], not visible here.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [q ...]")
    val outDir = args(0)
    val suffix = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable => println(s"[plandump] $name FAILED: $e")
      } finally Engine.clearStaged(spark, blocking = true)
    }
    spark.stop()
  }
}
