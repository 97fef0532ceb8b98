package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    Engine.configure(spark)
    spark.sparkContext.setLogLevel("WARN")
    val sigs = operators.TextOps.simhashDocs(spark, sfDir) // has orderBy, close enough shape
    val banded = operators.TextOps.simhashPairs(spark, sfDir)
    val plan = banded.queryExecution.optimizedPlan.toString
    println("[plan] md5 occurrences in optimized plan: " + "md5\\(".r.findAllIn(plan).size)
    println("[plan] aggregate( occurrences: " + "aggregate\\(".r.findAllIn(plan).size)
    println("[plan] pos of Generate nodes: " + "Generate".r.findAllIn(plan).size)
    println(plan.linesIterator.take(40).mkString("\n"))
    spark.stop()
  }
}
