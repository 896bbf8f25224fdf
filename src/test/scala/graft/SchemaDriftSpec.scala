package graft

import org.apache.spark.sql.functions._

/** Pins `Tables.events` against every physical parquet encoding of `ts`
  * the driver's testdata generator has shipped (round-5: INT64 nanos-as-long
  * via the legacy conf; round-6: TIMESTAMP(MICROS) scanning as NTZ) plus the
  * LTZ variant Spark itself writes — a driver-side testdata regeneration
  * must be a loader no-op, never a query-family outage (the round-6 failure
  * mode: 13 queries crashed at analysis because the loader assumed one
  * encoding).
  */
class SchemaDriftSpec extends SparkTestBase {
  import spark.implicits._

  // one wall-clock-identical fixture, three physical encodings
  private val micros = Seq(
    1L  -> 1704067200000000L, // 2024-01-01T00:00:00Z
    2L  -> 1704067200123456L, // sub-second precision must survive
    3L  -> 1735689599999999L, // 2024-12-31T23:59:59.999999Z
  )

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-drift").toString

  private lazy val nanosDir = {
    val d = tmp()
    micros.toDF("id", "us")
      .select($"id", ($"us" * 1000L).as("ts"))   // plain INT64 — scans as LongType,
      .write.parquet(s"$d/events.parquet")       // same dispatch arm as nanos-as-long
    d
  }
  private lazy val ntzDir = {
    val d = tmp()
    micros.toDF("id", "us")
      .select($"id", timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
      .write.parquet(s"$d/events.parquet")       // TIMESTAMP(MICROS, utc=false)
    d
  }
  private lazy val ltzDir = {
    val d = tmp()
    micros.toDF("id", "us")
      .select($"id", timestamp_micros($"us").as("ts"))
      .write.parquet(s"$d/events.parquet")       // TIMESTAMP(MICROS, utc=true)
    d
  }

  private def loaded(dir: String): Map[Long, Long] =
    Tables.events(spark, dir)
      .select($"id", unix_micros($"ts").as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("events loader yields identical rows from all three ts encodings") {
    val expect = micros.toMap
    assert(loaded(nanosDir) == expect, "INT64-nanos encoding drifted")
    assert(loaded(ntzDir) == expect, "TIMESTAMP_MICROS(NTZ) encoding drifted")
    assert(loaded(ltzDir) == expect, "TIMESTAMP_MICROS(LTZ) encoding drifted")
  }

  test("loader output type is LTZ timestamp under every encoding") {
    // downstream queries use unix_micros, which REJECTS ntz — the loader
    // must normalize to TimestampType no matter what the scan produced
    for (d <- Seq(nanosDir, ntzDir, ltzDir))
      assert(Tables.events(spark, d).schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"wrong ts type from $d")
  }
}
