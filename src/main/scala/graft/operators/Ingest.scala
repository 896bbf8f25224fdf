package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference's physical sink, Spark-first (SURVEY.md §2 rows 4-6).
  *
  * Reference behavior (`ETLTask.java:144-219`): one `AvroParquetWriter`
  * per (topic, partition), Snappy, path
  * `<out>/<topic>/<yyyy-MM-dd/HH/mm>/part-<partition>-<seq>.parquet`,
  * hand-rolled exists-probing for uniqueness.
  *
  * Here the same layout is a declarative partitioned write:
  * `partitionBy(topic, dt, hour)` + `compression=snappy`. Spark's commit
  * protocol replaces the exists-loop (task-attempt files + atomic job
  * commit), and at cluster scale every executor writes its own partition
  * files in parallel instead of the reference's single-threaded loop.
  * Bucketing is by EVENT time (the payload's `ts`), not processing time —
  * the semantic upgrade noted in SURVEY.md §1.1.
  */
object Ingest {

  /** Add the reference's path-layout columns derived from event time. */
  def withBucketColumns(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .withColumn("hour", date_format(col(tsCol), "HH"))

  /** Batch form of the reference's whole pipeline: bucket + partitioned
    * Snappy parquet append. `topicCol` plays the reference's topic role.
    */
  def writePartitioned(df: DataFrame, out: String,
                       topicCol: String = "event_type",
                       tsCol: String = "ts",
                       mode: SaveMode = SaveMode.Append): Unit =
    withBucketColumns(df, tsCol)
      .withColumn("topic", col(topicCol))
      .write
      .mode(mode)
      .partitionBy("topic", "dt", "hour")
      .option("compression", "snappy")
      .parquet(out)
}
