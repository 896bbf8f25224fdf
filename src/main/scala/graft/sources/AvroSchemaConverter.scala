package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro schema → Spark Catalyst type mapping (SURVEY.md §1.2).
  *
  * Covers the constructs the reference's pass-through pipeline supports
  * (the full Avro spec via `GenericDatumReader`, of which the shipped
  * schema `item-view-event.avsc` exercises record / nested record /
  * union["null",T] / string / long): primitives, records, arrays, maps,
  * enums (→ string), fixed (→ binary), nullable unions, and the common
  * logical types (date, timestamp-millis/micros, decimal on bytes/fixed).
  *
  * Non-null unions beyond ["null", T] are not supported — the reference
  * never produces them and their Catalyst encoding (a struct of branches)
  * would leak into user schemas.
  */
object AvroSchemaConverter {

  final case class SchemaType(dataType: DataType, nullable: Boolean)

  def toSqlType(schema: Schema): DataType = convert(schema).dataType

  def convert(schema: Schema): SchemaType = schema.getType match {
    case Schema.Type.BOOLEAN => SchemaType(BooleanType, nullable = false)
    case Schema.Type.INT =>
      schema.getLogicalType match {
        case _: LogicalTypes.Date => SchemaType(DateType, nullable = false)
        case _ => SchemaType(IntegerType, nullable = false)
      }
    case Schema.Type.LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          SchemaType(TimestampType, nullable = false)
        case _ => SchemaType(LongType, nullable = false)
      }
    case Schema.Type.FLOAT  => SchemaType(FloatType, nullable = false)
    case Schema.Type.DOUBLE => SchemaType(DoubleType, nullable = false)
    case Schema.Type.STRING | Schema.Type.ENUM =>
      SchemaType(StringType, nullable = false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      schema.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          SchemaType(DecimalType(d.getPrecision, d.getScale), nullable = false)
        case _ => SchemaType(BinaryType, nullable = false)
      }
    case Schema.Type.RECORD =>
      val fields = schema.getFields.asScala.map { f =>
        val st = convert(f.schema())
        StructField(f.name(), st.dataType, st.nullable)
      }.toArray
      SchemaType(StructType(fields), nullable = false)
    case Schema.Type.ARRAY =>
      val el = convert(schema.getElementType)
      SchemaType(ArrayType(el.dataType, el.nullable), nullable = false)
    case Schema.Type.MAP =>
      val v = convert(schema.getValueType)
      SchemaType(MapType(StringType, v.dataType, v.nullable), nullable = false)
    case Schema.Type.UNION =>
      val branches = schema.getTypes.asScala
      if (branches.exists(_.getType == Schema.Type.NULL)) {
        val nonNull = branches.filter(_.getType != Schema.Type.NULL)
        nonNull.toList match {
          case single :: Nil =>
            val st = convert(single)
            SchemaType(st.dataType, nullable = true)
          case _ => throw new UnsupportedOperationException(
            s"multi-branch Avro union not supported: $schema")
        }
      } else throw new UnsupportedOperationException(
        s"non-nullable Avro union not supported: $schema")
    case Schema.Type.NULL => SchemaType(NullType, nullable = true)
  }

  /** The non-null branch of a ["null", T] union, or the schema itself. */
  def nonNull(schema: Schema): Schema =
    if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(schema)
    else schema
}
