package graft.sources

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch source for Avro Object Container Files — the at-rest form of the
  * reference's wire data (a raw dump of what
  * `KafkaAvroEventSerializer.java:30-49` produces, framed per the Avro
  * spec). Lets a user backfill/reprocess historical `.avro` dumps through
  * the same decode path the streaming pipeline uses.
  *
  * Shape: Spark's `binaryFile` source scans files in parallel (one task
  * per file/split); each task de-frames its container with the public
  * `DataFileStream` and re-emits every record's raw binary-Avro bytes
  * (writer schema from the container header), which then flow through the
  * SAME `from_avro_bytes` native expression the pipeline uses — one tested
  * decode path for wire, stream, and container data.
  *
  * Scale: per-file parallelism with zero shuffles; decode is per-record
  * CPU. The de-frame + re-encode hop costs one datum copy per record —
  * acceptable for backfills, and it keeps OCF block/codec handling inside
  * the Avro runtime instead of re-implementing it.
  *
  * @param readerSchemaJson the schema to decode INTO (the registry's
  *   topic schema); containers written with the same schema round-trip
  *   exactly.
  */
object AvroOcf {

  /** Read `*.avro` container files under `path` into a flattened
    * DataFrame of the schema's fields. */
  def read(spark: SparkSession, path: String, readerSchemaJson: String): DataFrame = {
    val wire = wireFrame(spark, path, readerSchemaJson)
    wire.select(graft.functions.AvroFunctions
        .from_avro_bytes(col("value"), readerSchemaJson).as("event"))
      .select("event.*")
  }

  /** De-frame containers into the (value binary) wire shape — each row is
    * one record's raw binary-Avro bytes, re-encoded with the READER
    * schema so downstream decode sees a single schema even if containers
    * carry compatible writer variants. */
  private[graft] def wireFrame(spark: SparkSession, path: String,
                               readerSchemaJson: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(path)
      .select("content").as[Array[Byte]]
      .mapPartitions { files =>
        files.flatMap { bytes =>
          val readerSchema = new org.apache.avro.Schema.Parser().parse(readerSchemaJson)
          val stream = new DataFileStream[GenericRecord](
            new java.io.ByteArrayInputStream(bytes),
            new GenericDatumReader[GenericRecord](null, readerSchema))
          val writer = new GenericDatumWriter[GenericRecord](readerSchema)
          val out = new java.io.ByteArrayOutputStream(256)
          new Iterator[Array[Byte]] {
            override def hasNext: Boolean = {
              val h = stream.hasNext
              if (!h) stream.close()
              h
            }
            override def next(): Array[Byte] = {
              val rec = stream.next()
              out.reset()
              val enc = EncoderFactory.get.binaryEncoder(out, null)
              writer.write(rec, enc)
              enc.flush()
              out.toByteArray
            }
          }
        }
      }
      .toDF("value")
  }
}
