package graft.tools

import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev utility: the ALWAYS-ACTIVE-KEY state probe for the buffered
  * keyed-state operators (VERDICT r14 task 3). The r13 StateMetrics
  * numbers were small because fixture users go quiet and the
  * last-activity+horizon timeout GCs them; a perpetually-active whale
  * key re-arms its timeout forever, so WITHOUT settled-prefix
  * compaction its buffer grows with lifetime event count — the 100 TB
  * hazard this probe plants and measures.
  *
  * One whale user receives `perBatch` events every batch for `batches`
  * micro-batches, each batch one event-time minute after the last, with
  * a tick key advancing the watermark (10 s delay) — so by batch i the
  * whale holds i·perBatch lifetime events but only the unsettled tail
  * should remain buffered. After each batch the state operator's
  * numRowsTotal / memoryUsedBytes are sampled from query progress; a
  * bounded (flat) byte curve across batches is the compaction
  * certificate, a linear one is the bug.
  *
  * Round 16 (VERDICT r15 task 3): the probe also drives the
  * consolidated [[StreamOps.userTimelineStream]] (sess+funl+path
  * branches under one state store) and scales the intra-batch event
  * spacing with `perBatch`, so the ×100 decade (perBatch 50 → 5,000;
  * whale lifetime 1.5k → 150k events per op) runs without event-time
  * overlap between batches — at any perBatch the batch's events stay
  * inside its minute, so the watermark advances monotonically and
  * "flat state while lifetime grows ×100" is measured, not argued.
  *
  * Usage: WhaleProbe [batches] [perBatch]
  * Output: one `[whale]` TSV line per (op, batch) — append to PERF.md.
  */
object WhaleProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(30)
    val perBatch = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq = spark.sqlContext

    // (batchId -> (maxRows, maxMemBytes)) per run, folded by listener
    val samples = scala.collection.concurrent.TrieMap
      .empty[Long, (Long, Long)]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators
          .filter(_.operatorName.contains("flatMapGroupsWithState"))
          .foreach { so =>
            samples.updateWith(e.progress.batchId) {
              case Some((r, m)) => Some((math.max(r, so.numRowsTotal),
                                         math.max(m, so.memoryUsedBytes)))
              case None => Some((so.numRowsTotal, so.memoryUsedBytes))
            }
          }
    }
    spark.streams.addListener(listener)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

    def ts(ms: Long) = new java.sql.Timestamp(ms)

    println("[whale]\top\tbatch\tlifetime_events\tstate_rows\tstate_mem_bytes")

    // intra-batch event spacing (ms): the whole batch must fit inside
    // its minute or later batches plant pre-watermark (dropped) events
    val stepMs = math.max(1L, 55000L / perBatch)

    def drain(op: String, mult: Int = 1): Unit = {
      // listener delivery is async: poll until quiet
      var quiet = 0; var prev = samples.toMap; var waited = 0
      while (quiet < 2 && waited < 40) {
        Thread.sleep(250); waited += 1
        val cur = samples.toMap
        if (cur == prev) quiet += 1 else { quiet = 0; prev = cur }
      }
      samples.toSeq.sortBy(_._1).foreach { case (b, (r, m)) =>
        println(s"[whale]\t$op\t$b\t${(b + 1) * perBatch * mult}\t$r\t$m") }
      samples.clear()
    }

    // ---- funnel ----
    val fm = MemoryStream[StreamOps.FunnelEvent]
    val fq = StreamOps.funnelStageStream(fm.toDS(),
        stages = Seq("view", "cart", "buy"),
        horizonMs = 3600000L, watermarkDelay = "10 seconds")
      .writeStream.format("noop").outputMode("append").start()
    for (i <- 0 until batches) {
      val b0 = base + i * 60000L
      val evs = (0 until perBatch).map { j =>
        StreamOps.FunnelEvent(1L, ts(b0 + j * stepMs),
          Seq("view", "cart", "buy")(j % 3))
      } :+ StreamOps.FunnelEvent(9L, ts(b0 + 59000L), "tick")
      fm.addData(evs)
      fq.processAllAvailable()
    }
    fq.stop(); drain("funnel")

    // ---- paths ----
    val pm = MemoryStream[StreamOps.PathEvent]
    val pq = StreamOps.eventPathsStream(pm.toDS(),
        horizonMs = 3600000L, watermarkDelay = "10 seconds")
      .writeStream.format("noop").outputMode("append").start()
    for (i <- 0 until batches) {
      val b0 = base + i * 60000L
      val evs = (0 until perBatch).map { j =>
        StreamOps.PathEvent(1L, ts(b0 + j * stepMs), i.toLong * perBatch + j,
          ("ev" + (j % 5)))
      } :+ StreamOps.PathEvent(9L, ts(b0 + 59000L), -1L, "tick")
      pm.addData(evs)
      pq.processAllAvailable()
    }
    pq.stop(); drain("paths")

    // ---- consolidated timeline (sess + funl + path under ONE store) ----
    val tm = MemoryStream[StreamOps.TlEvent]
    val tq = StreamOps.userTimelineStream(tm.toDS(),
        stages = Seq("view", "cart", "buy"),
        gapMs = 3600000L, horizonMs = 3600000L,
        watermarkDelay = "10 seconds")
      .writeStream.format("noop").outputMode("append").start()
    for (i <- 0 until batches) {
      val b0 = base + i * 60000L
      val evs = (0 until perBatch).flatMap { j =>
        val t = ts(b0 + j * stepMs)
        val eid = i.toLong * perBatch + j
        Seq(
          StreamOps.TlEvent("funl", 1L, t, eid,
            Seq("view", "cart", "buy")(j % 3), 0.0),
          StreamOps.TlEvent("path", 1L, t, eid, "ev" + (j % 5), 0.0),
          StreamOps.TlEvent("sess", 1L, t, eid, "x", 1.0))
      } :+ StreamOps.TlEvent("path", 9L, ts(b0 + 59000L), -1L, "tick", 0.0)
      tm.addData(evs)
      tq.processAllAvailable()
    }
    tq.stop(); drain("timeline", mult = 3)

    spark.streams.removeListener(listener)
    spark.stop()
  }
}
