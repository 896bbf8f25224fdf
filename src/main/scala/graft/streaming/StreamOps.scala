package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
