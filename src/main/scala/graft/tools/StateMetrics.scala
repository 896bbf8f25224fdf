package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.concurrent.TrieMap

/** Dev utility: run keyed-state streaming gates and report their state-
  * store footprint — the axis the g100 streaming study identified as the
  * one that binds at production scale (wall-clock is linear and
  * partition-parallel; STATE per executor is not, unless it is bounded
  * per key or TTL'd).
  *
  * The gates start and await their streaming queries internally, so the
  * probe is a session-level [[StreamingQueryListener]]: every progress
  * event's `stateOperators` is folded into a per-(gate, operator) max of
  * `numRowsTotal` / `memoryUsedBytes`, plus the on-disk SST footprint
  * where the store is RocksDB (the `rocksdbSstFileSize` custom metric;
  * HDFS-backed stores report through memoryUsedBytes instead and show 0
  * here). Events are delivered async — after each gate the drain loop
  * polls until the fold is quiet for two consecutive ticks, so a slow
  * final event cannot be attributed to the NEXT gate's row.
  *
  * Usage: StateMetrics <sfDir> [gate ...]
  * Output: one `[state]` TSV line per (gate, stateOperator) — append the
  * table to PERF.md.
  */
object StateMetrics {

  private val defaultGates = Seq(
    "q104_incdedup_stream", // NO state store (broadcast bloom + stream-
                            // static anti-join — pinned by StreamingSpec)
    "q107_minhash_stream",  // state ≈ band-bucket postings (RocksDB)
    "q177_funnel_stream",   // state ≈ per-user stage vector (bounded/key)
    "q223_paths_stream")    // state ≈ per-user recent-path buffer

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val gates = if (args.length > 1) args.drop(1).toSeq else defaultGates
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (operatorName -> (maxRows, maxMemBytes, maxSstBytes, updatedRows))
    val acc = TrieMap.empty[String, (Long, Long, Long, Long)]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach { so =>
          val sst = Option(so.customMetrics)
            .map(_.getOrDefault("rocksdbSstFileSize",
                                java.lang.Long.valueOf(0L)).longValue())
            .getOrElse(0L)
          acc.updateWith(so.operatorName) {
            case Some((r, m, s0, u)) => Some((
              math.max(r, so.numRowsTotal), math.max(m, so.memoryUsedBytes),
              math.max(s0, sst), u + so.numRowsUpdated))
            case None => Some((so.numRowsTotal, so.memoryUsedBytes, sst,
                               so.numRowsUpdated))
          }
        }
    }
    spark.streams.addListener(listener)

    println("[state]\tgate\toperator\tmax_rows\tmax_mem_bytes\t" +
            "max_sst_bytes\trows_updated\twall_s")
    for (g <- gates) {
      acc.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(g)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are delivered async — poll until the fold is
      // quiet for two consecutive ticks (bounded at 20 s) so a late
      // event can't leak into the next gate's cleared accumulator
      var quiet = 0
      var prev = acc.toMap
      var waited = 0
      while (quiet < 2 && waited < 40) {
        Thread.sleep(500); waited += 1
        val cur = acc.toMap
        if (cur == prev) quiet += 1 else { quiet = 0; prev = cur }
      }
      if (acc.isEmpty)
        println(f"[state]\t$g\t(no state operator)\t0\t0\t0\t0\t$wall%.2f")
      for ((op, (r, m, s0, u)) <- acc.toSeq.sortBy(_._1))
        println(f"[state]\t$g\t$op\t$r\t$m\t$s0\t$u\t$wall%.2f")
      System.err.println(s"[state] $g done: $n output rows")
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
