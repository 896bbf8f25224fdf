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

  test("expirePartitions drops only dt dirs older than the cutoff") {
    val out = Files.createTempDirectory("graft-retain").toString
    val events = Tables.events(spark, sfDir)
    Ingest.writePartitioned(events, out)
    val allDts = spark.read.parquet(out).select("dt").distinct()
      .collect().map(_.get(0).toString).sorted
    assert(allDts.length >= 2, s"testdata must span >=2 days, got ${allDts.toSeq}")
    val cutoff = allDts.last // expire everything before the newest day
    val deleted = Ingest.expirePartitions(spark, out, cutoff)
    assert(deleted.nonEmpty)
    assert(deleted.forall(p => p.contains("dt=") && p.substring(p.indexOf("dt=") + 3) < cutoff))
    val remaining = spark.read.parquet(out).select("dt").distinct()
      .collect().map(_.get(0).toString).toSet
    assert(remaining == Set(cutoff), s"only the newest day survives, got $remaining")
    // rows of the surviving day are intact
    assert(spark.read.parquet(out).count() ==
      events.filter(date_format(col("ts"), "yyyy-MM-dd") === cutoff).count())
  }

  test("compactTo collapses many small files to one per partition dir") {
    val out = Files.createTempDirectory("graft-compact-src").toString
    val dest = Files.createTempDirectory("graft-compact-dst").toString
    val events = Tables.events(spark, sfDir).limit(300)
    // simulate many micro-batches: 6 appends → ≥6 files per touched dir
    (1 to 6).foreach(_ => Ingest.writePartitioned(events.limit(50), out))
    def dataFiles(root: String) =
      Files.walk(java.nio.file.Paths.get(root)).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("_spark_metadata"))
    val before = dataFiles(out).length
    Ingest.compactTo(spark, out, dest, Seq("topic", "dt", "hour"))
    val after = dataFiles(dest).length
    // row parity, layout parity, strictly fewer files (one per dir)
    assert(spark.read.parquet(dest).count() == spark.read.parquet(out).count())
    val dirsOf = (r: String) => dataFiles(r)
      .map(p => p.substring(0, p.lastIndexOf('/'))).toSet
    assert(dirsOf(dest).map(_.replace(dest, "")) == dirsOf(out).map(_.replace(out, "")))
    assert(after < before, s"expected compaction, got $before -> $after")
    assert(after == dirsOf(dest).size, "one file per partition dir")
  }
}
