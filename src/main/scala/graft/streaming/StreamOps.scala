package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native operators layered on the ETL pipeline — the event-time
  * semantics the reference lacks (SURVEY.md §2 "Explicit absences": no
  * watermarks, no event-time windows, no keyed state) plus streaming
  * exact-dedup (§2 row 11 [extension]).
  *
  * All state is watermark-bounded: at 100 TB/day the state store holds
  * only `watermark × key-cardinality` entries, and eviction is automatic.
  */
object StreamOps {

  /** Streaming exact dedup by key within a watermark window — the
    * streaming form of EventOps.q22/q23. State size is bounded by the
    * delay; duplicates arriving later than the watermark are dropped by
    * definition of the bound (documented at-least-once → effectively-once
    * upgrade over the reference, which never dedups).
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, delay: String,
                           keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Tumbling event-time window aggregation with late-data handling — the
    * semantic upgrade over the reference's wall-clock file roll (which
    * writes late data into whatever file is open, `ETLTask.java:261-283`).
    */
  def eventTimeCounts(df: DataFrame, tsCol: String, delay: String,
                      window_ : String, keyCol: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
              col("n_events"), col("total_value"))

  /** Streaming top-k per event-time window via the bounded-heap aggregate
    * (`TopKAgg`) — possible precisely BECAUSE top-k is an aggregate here,
    * not a window function (rank windows don't run on streams). State per
    * open window is the k-element heap buffer, watermark-evicted; each
    * closed window emits its ranked top-k once (append mode).
    */
  def windowTopK(df: DataFrame, tsCol: String, delay: String, window_ : String,
                 scoreCol: String, idCol: String, k: Int): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), window_))
      .agg(graft.functions.TopKAgg
        .top_k_by_score(col(scoreCol), col(idCol), k).as("top"))
      .select(col("window.start").as("window_start"),
              posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col("window_start"), (col("rnk0") + 1).cast("long").as("rnk"),
              col("t.id").as(idCol), col("t.score").as(scoreCol))

  /** Watermarked stream-stream inner join: enrich an event stream with a
    * second stream keyed the same way, matching only within a bounded
    * event-time band. Both sides carry watermarks and the join condition
    * bounds their time difference, so Spark can size and evict the join
    * state on both sides — without the band, stream-stream state grows
    * forever. At 100 TB/day state is `2 × band × per-key rate`, and the
    * shuffle is keyed by the join key exactly like the batch plan.
    */
  def enrichStream(events: DataFrame, enrich: DataFrame,
                   key: String, tsCol: String, delay: String,
                   band: String): DataFrame = {
    val l = events.withWatermark(tsCol, delay)
    val r = enrich
      .withColumnRenamed(key, s"r_$key")
      .withColumnRenamed(tsCol, s"r_$tsCol")
      .withWatermark(s"r_$tsCol", delay)
    l.join(r,
      col(key) === col(s"r_$key") &&
      col(s"r_$tsCol") >= col(tsCol) - expr(s"INTERVAL $band") &&
      col(s"r_$tsCol") <= col(tsCol) + expr(s"INTERVAL $band"))
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp,
                              n_events: Long, total_value: Double)
  final case class SessionAgg(start: Long, end: Long, n: Long, total: Double)

  /** Gap-based streaming sessionization via custom keyed state
    * (`flatMapGroupsWithState`, event-time timeout) — the streaming twin
    * of EventOps.q24. A session closes when no event arrives within
    * `gapMs` of its last event; the close is detected by the state
    * timeout once the watermark passes session_end + gap.
    *
    * State per key is one open session (4 longs) — at 100 TB/day the
    * state store scales with ACTIVE users only, and event-time timeout
    * guarantees eviction.
    */
  def sessionizeStream(ds: Dataset[SessionEvent], gapMs: Long,
                       watermarkDelay: String)
                      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._

    def toOut(uid: Long, s: SessionAgg): SessionOut =
      SessionOut(uid, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
                 s.n, s.total)

    def update(uid: Long, events: Iterator[SessionEvent],
               state: GroupState[SessionAgg]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = toOut(uid, state.get)
        state.remove()
        Iterator.single(out)
      } else {
        val sorted = events.toSeq.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          val t = e.ts.getTime
          open match {
            case Some(s) if t - s.end <= gapMs =>
              open = Some(SessionAgg(s.start, math.max(s.end, t), s.n + 1,
                                     s.total + e.value))
            case Some(s) =>
              closed += toOut(uid, s)
              open = Some(SessionAgg(t, t, 1, e.value))
            case None =>
              open = Some(SessionAgg(t, t, 1, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.result().iterator
      }
    }

    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
