package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility (r15 task-1c experiment): does a df cap on q174's FULL
  * index side change the output, and does it pay? Runs the declared
  * prefix-containment join uncapped and at a sweep of caps, reporting
  * per-cap row count, set difference vs uncapped, and min-of-3 wall.
  * Usage: CapProbe <sfDir> [caps...]
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val caps = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
               else Seq(32L, 64L, 128L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(cap: Long): (Set[(Long, Long)], Double) = {
      var best = Double.MaxValue
      var rows: Set[(Long, Long)] = Set.empty
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        rows = graft.operators.TextAnalysis
          .prefixContainmentJoin(spark, sfDir, fullMaxDf = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (rows, best)
    }
    run(-1L) // warm
    val (base, tBase) = run(-1L)
    println(f"[cap] uncapped rows=${base.size} min3=$tBase%.2fs")
    for (c <- caps) {
      val (got, t) = run(c)
      println(f"[cap] cap=$c rows=${got.size} min3=$t%.2fs " +
        s"missing=${(base -- got).size} extra=${(got -- base).size}")
    }
    spark.stop()
  }
}
