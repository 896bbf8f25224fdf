package graft

import org.apache.spark.sql.functions._

/** End-to-end twin of SchemaDriftSpec: REAL events-family queries run over
  * a full-schema events fixture written under BOTH physical `ts` encodings
  * (INT64 nanos-as-long and TIMESTAMP_MICROS) and must return identical
  * rows. SchemaDriftSpec pins the loader; this pins the queries the
  * round-6 outage actually took down — a testdata regeneration now has a
  * spec standing between it and the whole family.
  */
class EventsEncodingSpec extends SparkTestBase {
  import spark.implicits._

  // full events schema: event_id, ts, user_id, event_type, value, props
  private val baseMicros = 1704067200000000L // 2024-01-01T00:00:00Z
  private val fixture = (0 until 200).map { i =>
    (i.toLong, baseMicros + i.toLong * 37000000L + (i % 7).toLong,
     (i % 13).toLong, Seq("click", "view", "error")(i % 3),
     (i % 29) * 1.5, s"""{"k":$i}""")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-evenc").toString

  private lazy val microsDir = {
    val d = tmp()
    fixture.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select($"event_id", timestamp_micros($"us").cast("timestamp_ntz").as("ts"),
              $"user_id", $"event_type", $"value", $"props")
      .write.parquet(s"$d/events.parquet")
    d
  }
  private lazy val nanosDir = {
    val d = tmp()
    fixture.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select($"event_id", ($"us" * 1000L).as("ts"),
              $"user_id", $"event_type", $"value", $"props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  // events-only members of the family (q27 as-of joins orders, which the
  // fixture dir doesn't carry; q20 ingests to disk — both covered by the
  // real-testdata gate)
  private val family = Seq("q21_event_window", "q23_dedup_first",
    "q24_sessionize", "q25_json_extract", "q62_pivot",
    "q72_latest_per_key", "q144_scd2_intervals", "q145_skew_report",
    "q146_outlier_events", "q148_state_diff", "q152_incremental_agg")

  test("events-family queries return identical rows under both ts encodings") {
    for (name <- family) {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, microsDir).collect().map(_.toString).sorted
      val b = fn(spark, nanosDir).collect().map(_.toString).sorted
      assert(a.nonEmpty, s"$name: fixture produced no rows")
      assert(a.sameElements(b), s"$name drifts across ts encodings")
    }
  }
}
