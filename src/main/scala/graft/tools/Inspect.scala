package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev utility: time and/or explain a single query.
  * Usage: Inspect <queryName> <sfDir> [explain]
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    // warm + timed runs
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val n = df.count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      // the AQE-final plan (what actually executed), not the static one
      if (i == 1 && args.contains("explainExec"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
