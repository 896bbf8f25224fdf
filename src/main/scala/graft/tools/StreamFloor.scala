package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: measure the STREAMING GATE FIXED COST — what a bounded
  * AvailableNow pass costs before any operator logic runs. Each
  * declared streaming gate pays (a) streaming-query start/stop, (b) the
  * file-source listing + one data micro-batch + the closing no-data
  * batch, (c) per-stateful-operator state-store instantiation. This
  * main times probe plans of increasing statefulness over the SAME
  * staged sources and bounded runner the gates use (StreamGate's probe
  * hooks), so the per-gate plan cost in BENCH can be read as
  * (bench time − matching floor).
  *
  * Usage: StreamFloor [sfDir]   (defaults to sf0.1; min-of-3 per probe)
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.StreamGate

    def ev: DataFrame = StreamGate.probeEventStream(spark, sfDir)
    def doc: DataFrame = StreamGate.probeDocStream(spark, sfDir)

    // probe plans, stateless → one stateful op → watermarked window agg
    // (the modal gate shape) → the RocksDB provider variant q107 pays
    val probes: Seq[(String, () => DataFrame)] = Seq(
      "events_stateless" -> (() =>
        StreamGate.probeRunToBatch(spark,
          ev.filter(col("event_id") >= 0).select("event_id"))),
      "docs_stateless" -> (() =>
        StreamGate.probeRunToBatch(spark,
          doc.select("doc_id"))),
      "events_complete_agg" -> (() =>
        StreamGate.probeRunToBatch(spark,
          ev.filter(col("event_id") >= 0).groupBy().count(), "complete")),
      "events_watermark_window" -> (() =>
        StreamGate.probeRunToBatch(spark,
          ev.withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "1 hour")).count()
            .filter(lit(true)))),
      "events_watermark_window_rocksdb" -> (() =>
        StreamGate.probeRunToBatchRocks(spark,
          ev.withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "1 hour")).count()
            .filter(lit(true)))))

    // warm-up: stage dirs + first query-start JIT, untimed
    probes.foreach { case (_, p) => p().count() }

    val results = probes.map { case (name, p) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        p().count()
        (System.nanoTime() - t0) / 1e9
      }
      name -> (math.floor(times.min * 1000) / 1000)
    }
    val json = results
      .map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"sf":"$sfDir","floors_sec":{$json}}""")
    spark.stop()
  }
}
