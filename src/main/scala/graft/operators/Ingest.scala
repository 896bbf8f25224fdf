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
    *
    * Parquet physical knobs mirror the reference's writer config
    * (`ETLTask.java:146-148`, `:197`): 256 MiB row groups
    * (`CONF_BLOCK_SIZE` default), 64 KiB pages (`CONF_PAGE_SIZE`),
    * dictionary encoding on. Exposed the Spark way — per-write options
    * picked up by the parquet output format.
    */
  def writePartitioned(df: DataFrame, out: String,
                       topicCol: String = "event_type",
                       tsCol: String = "ts",
                       mode: SaveMode = SaveMode.Append,
                       blockSize: Long = 256L * 1024 * 1024,
                       pageSize: Int = 64 * 1024,
                       dictionary: Boolean = true): Unit =
    withBucketColumns(df, tsCol)
      .withColumn("topic", col(topicCol))
      .write
      .mode(mode)
      .partitionBy("topic", "dt", "hour")
      .option("compression", "snappy")
      .option("parquet.block.size", blockSize.toString)
      .option("parquet.page.size", pageSize.toString)
      .option("parquet.enable.dictionary", dictionary.toString)
      .parquet(out)

  /** Small-file compaction for a partitioned parquet dataset — the
    * operational companion of any per-trigger streaming sink (the
    * pipeline writes one file set per micro-batch per topic; a day of
    * 1-minute triggers is 1440 file sets per partition dir). Rewrites
    * `src` into `dest` with the same Hive-style partition columns, sized
    * so each output task holds ~`targetBytes` of input: rows of one
    * partition directory hash to one task, so each dir compacts to one
    * file (a dir larger than `targetBytes` still writes one file here —
    * split with a salt column if single dirs outgrow row-group targets).
    * Destination is a NEW path: readers cut over by path swap (Spark
    * refuses overwrite-while-reading, and a swap is the atomic op HDFS/
    * object stores actually give you).
    */
  def compactTo(spark: org.apache.spark.sql.SparkSession,
                src: String, dest: String,
                partitionCols: Seq[String],
                targetBytes: Long = 256L * 1024 * 1024): Unit = {
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(src)).getLength
    val nTasks = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // read partition values as raw strings: type inference would turn
    // hour=05 into int 5 and the rewrite would RENAME directories —
    // a compactor must preserve the layout byte-for-byte
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.get(inferKey)
    spark.conf.set(inferKey, "false")
    val source = // schema resolves eagerly here, so restoring the conf after is safe
      try spark.read.parquet(src)
      finally spark.conf.set(inferKey, prev)
    source
      .repartition(nTasks, partitionCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .option("compression", "snappy")
      .parquet(dest)
  }

  /** Time-partition retention: drop `dt=<date>` partition directories
    * strictly older than `cutoff` (ISO dates compare lexicographically,
    * so this is a pure string comparison on directory names — no data is
    * read). Walks through any non-date partition levels above `dateCol`
    * (e.g. topic dirs over dt dirs). Returns the deleted paths. Driver-side
    * filesystem metadata work only — the same shape at any data volume.
    */
  def expirePartitions(spark: org.apache.spark.sql.SparkSession,
                       root: String, cutoff: String,
                       dateCol: String = "dt"): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = s"$dateCol="
    def walk(p: Path): Seq[Path] = {
      val entries = fs.listStatus(p).toSeq.filter(_.isDirectory)
      val (dateDirs, others) = entries.partition(_.getPath.getName.startsWith(prefix))
      dateDirs.map(_.getPath) ++
        others.filter(_.getPath.getName.contains("="))
          .flatMap(e => walk(e.getPath))
    }
    val expired = walk(new Path(root))
      .filter(_.getName.stripPrefix(prefix) < cutoff)
    expired.foreach(p => fs.delete(p, true))
    expired.map(_.toString)
  }
}
