package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev utility: measure WATERMARK-DRIVEN STATE EVICTION in the q107-class
  * keyed-state stream — the piece the StateMetrics decade could not see.
  *
  * The q107 GATE pins constant event time (so its output equals batch
  * q42's, which is what the oracle certifies); under constant event time
  * the watermark never advances and state is corpus-linear — the 291
  * B/posting constant StateMetrics measured. In production event time
  * ADVANCES, and the same processor's event-time timers evict residents
  * older than the horizon, so steady-state state is bounded by the
  * horizon's DATA RATE, not the corpus. This probe measures exactly
  * that: the documents corpus is staged as one file per synthetic hour
  * (`maxFilesPerTrigger = 1` → one micro-batch per hour), the stream
  * runs the REAL `nearDupPairsStream` operator (RocksDB provider, 1 h
  * delay), and per-batch `StateOperatorProgress` shows rows added,
  * rows REMOVED, and the plateau.
  *
  * Usage: StateTtlProbe <sfDir> [nHours (default 8)]
  * Output: one `[ttl]` TSV line per micro-batch per state operator.
  */
object StateTtlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hours = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // recentProgress is the report source — size it to the batch count
      // (default 100 would silently drop the ramp-up rows at nHours > ~98)
      .config("spark.sql.streaming.numRecentProgressUpdates",
        (hours + 8).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage: hour h holds docs with doc_id ≡ h (mod hours), event time
    // 2024-01-01 + h hours; one part file per hour, written in hour
    // order with distinct mtimes so the file source replays them in
    // event-time order
    val stageDir = java.nio.file.Files.createTempDirectory("graft_ttl_probe")
    val stage = stageDir.toString
    // the staging dir holds a full corpus copy — it must not outlive the
    // probe on ANY exit path (stream failure included), hence try/finally
    try {
      // one corpus scan for all hour slices, not one per slice
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
        .persist()
      for (h <- 0 until hours) {
        docs.filter(col("doc_id") % hours === h)
          .withColumn("ts", timestamp_seconds(lit(1704067200L + h * 3600L)))
          .coalesce(1).write.mode("append").parquet(stage)
        Thread.sleep(1100)
      }
      docs.unpersist()

      implicit val sp: SparkSession = spark
      val stream = spark.readStream
        .schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
      val out = graft.streaming.StreamOps.nearDupPairsStream(
        stream, "ts", "1 hour", delayMs = 3600000L, threshold = 0.8,
        maxResidents = 1000000)

      val q = out.writeStream.format("memory").queryName("ttl_probe")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      println("[ttl]\tbatch\tinput_rows\twatermark\toperator\trows_total\t" +
              "rows_updated\trows_removed\tmem_bytes")
      for (p <- q.recentProgress) {
        val wm = Option(p.eventTime).map(
          _.getOrDefault("watermark", "-")).getOrElse("-")
        for (so <- p.stateOperators)
          println(s"[ttl]\t${p.batchId}\t${p.numInputRows}\t$wm\t" +
                  s"${so.operatorName}\t${so.numRowsTotal}\t" +
                  s"${so.numRowsUpdated}\t${so.numRowsRemoved}\t" +
                  s"${so.memoryUsedBytes}")
      }
      val emitted = spark.table("ttl_probe").count()
      System.err.println(s"[ttl] emitted pairs: $emitted")
    } finally {
      spark.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(stageDir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
