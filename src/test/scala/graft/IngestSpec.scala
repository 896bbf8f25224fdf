package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestSpec extends SparkTestBase {

  test("writePartitioned reproduces the reference's topic/date/hour layout") {
    val out = Files.createTempDirectory("graft-ingest").toString
    val events = Tables.events(spark, sfDir)
    Ingest.writePartitioned(events, out)

    // layout: <out>/topic=<event_type>/dt=<yyyy-MM-dd>/hour=<HH>/*.parquet
    val topicDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("topic=")).toSet
    val expected = events.select("event_type").distinct()
      .collect().map(r => s"topic=${r.getString(0)}").toSet
    assert(topicDirs == expected)

    // read-back: partition pruning works and no rows were lost
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    val oneTopic = back.filter(col("topic") === "click")
    assert(oneTopic.count() ==
      events.filter(col("event_type") === "click").count())

    // partition columns round-trip (dt is re-inferred as DateType, hour as
    // int — partition-column type inference; values still match event time)
    val r = back.select("dt", "hour").limit(1).collect()(0)
    assert(r.get(0).toString.matches("\\d{4}-\\d{2}-\\d{2}"))
    assert(r.get(1).toString.matches("\\d{1,2}"))
  }

  test("append mode accumulates files without clobbering (at-least-once shape)") {
    val out = Files.createTempDirectory("graft-ingest2").toString
    val events = Tables.events(spark, sfDir).limit(100)
    Ingest.writePartitioned(events, out)
    Ingest.writePartitioned(events, out)
    assert(spark.read.parquet(out).count() == 200)
  }
}
