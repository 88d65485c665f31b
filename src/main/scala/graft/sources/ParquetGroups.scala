package graft.sources

import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** parquet-java `Group` → Spark internal value conversion, shared by
  * every engine reader that walks parquet records outside Spark's own
  * scan (the `graft-changes` stream and the `graft` batch source).
  * One definition, so the two readers cannot drift on type mapping.
  *
  * Supported physical types: BOOLEAN, INT32 (int/date/decimal), INT64
  * (long/timestamp MICROS|MILLIS|NANOS/decimal), INT96 (legacy
  * timestamp), FLOAT, DOUBLE, BINARY/FLBA (string/bytes/decimal),
  * plus 3-level LIST of those — the flat-primitive(+array) surface
  * commit-log tables carry.
  * Unsupported shapes are refused with a named error rather than
  * decoded wrongly; `who` labels the failing reader and file. */
private[graft] object ParquetGroups {

  /** The Catalyst types this low-level reader can produce. Anything
    * else (nested struct/map above all) must be refused loudly:
    * decoding a raw physical value into a slot Catalyst types
    * differently would serve silently wrong data. */
  private def checkTarget(to: DataType, who: => String): Unit = to match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         DateType | TimestampType | TimestampNTZType | StringType | BinaryType => ()
    case _: DecimalType => ()
    case other => throw new UnsupportedOperationException(
      s"$who: unsupported Catalyst type $other for the low-level parquet reader " +
        "(flat primitives, decimals, and arrays of them only)")
  }

  /** Parquet stores DECIMAL as the UNSCALED integer in INT32/INT64 or
    * big-endian two's-complement BINARY/FLBA. Interpret the unscaled
    * value at the FILE's annotated scale (the writer's truth), then
    * rescale to the declared Catalyst precision/scale — a file written
    * decimal(38,18) read under a declared DECIMAL(10,2) must yield the
    * same numeric value, not the raw digits reinterpreted. */
  private def fileScaleOf(ann: LogicalTypeAnnotation, to: DecimalType): Int =
    ann match {
      case d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation => d.getScale
      case _ => to.scale
    }

  private def decimalOf(unscaled: Long, fileScale: Int, to: DecimalType): Decimal =
    Decimal(BigDecimal(java.math.BigDecimal.valueOf(unscaled, fileScale)),
      to.precision, to.scale)

  private def decimalOf(bytes: Array[Byte], fileScale: Int, to: DecimalType): Decimal =
    Decimal(BigDecimal(new java.math.BigDecimal(
      new java.math.BigInteger(bytes), fileScale)), to.precision, to.scale)

  /** Field `fi` of `g` (known present) as the Spark-internal value for
    * Catalyst type `to`. The field's parquet type comes from the
    * group's OWN schema, so projected reads convert correctly. */
  def convert(g: Group, fi: Int, to: DataType, who: => String): Any = {
    if (!g.getType.getType(fi).isPrimitive) return convertList(g, fi, to, who)
    checkTarget(to, who)
    val pt = g.getType.getType(fi).asPrimitiveType()
    val ann = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN => g.getBoolean(fi, 0)
      case PrimitiveTypeName.INT32 =>
        val v = g.getInteger(fi, 0)
        to match {
          case LongType => v.toLong
          case DoubleType => v.toDouble
          case d: DecimalType => decimalOf(v.toLong, fileScaleOf(ann, d), d)
          case _ => v // IntegerType / DateType (days) share the int repr
        }
      case PrimitiveTypeName.INT64 =>
        val v = g.getLong(fi, 0)
        ann match {
          case t: TimestampLogicalTypeAnnotation => t.getUnit match {
            case TimeUnit.MICROS => v
            case TimeUnit.MILLIS => v * 1000L
            case TimeUnit.NANOS => Math.floorDiv(v, 1000L)
          }
          case _ => to match {
            case DoubleType => v.toDouble
            case d: DecimalType => decimalOf(v, fileScaleOf(ann, d), d)
            case _ => v
          }
        }
      case PrimitiveTypeName.INT96 =>
        // legacy impala layout: 8B nanos-of-day LE + 4B julian day LE
        val b = g.getInt96(fi, 0).getBytes
        val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanosOfDay = buf.getLong
        val julianDay = buf.getInt
        (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
      case PrimitiveTypeName.FLOAT =>
        val v = g.getFloat(fi, 0)
        to match { case DoubleType => v.toDouble; case _ => v }
      case PrimitiveTypeName.DOUBLE => g.getDouble(fi, 0)
      case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
        val bytes = g.getBinary(fi, 0).getBytes
        to match {
          case StringType => UTF8String.fromBytes(bytes)
          case d: DecimalType => decimalOf(bytes, fileScaleOf(ann, d), d)
          case _ if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
            UTF8String.fromBytes(bytes)
          case _ => bytes
        }
      case other => throw new UnsupportedOperationException(
        s"$who: unsupported parquet type $other")
    }
  }

  /** Parquet 3-level LIST (`optional group col (LIST) { repeated group
    * list { <element> } }`) -> Spark ArrayData — the layout Spark
    * itself writes for array columns, so array<primitive> tables read
    * through. Null elements surface as nulls; element conversion
    * mirrors the primitive rules. */
  private def convertList(g: Group, fi: Int, to: DataType, who: => String): Any = {
    val elemType = to match {
      case ArrayType(e, _) => e
      case other => throw new UnsupportedOperationException(
        s"$who: parquet LIST column read as non-array $other")
    }
    checkTarget(elemType, who)
    val listGroup = g.getGroup(fi, 0)
    val n = listGroup.getFieldRepetitionCount(0)
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val entry = listGroup.getGroup(0, k)
      out(k) =
        if (entry.getFieldRepetitionCount(0) == 0) null
        else {
          val et = entry.getType.getType(0).asPrimitiveType()
          val ann = et.getLogicalTypeAnnotation
          et.getPrimitiveTypeName match {
            case PrimitiveTypeName.BOOLEAN => entry.getBoolean(0, 0)
            case PrimitiveTypeName.INT32 =>
              val v = entry.getInteger(0, 0)
              elemType match {
                case LongType => v.toLong
                case DoubleType => v.toDouble
                case d: DecimalType => decimalOf(v.toLong, fileScaleOf(ann, d), d)
                case _ => v
              }
            case PrimitiveTypeName.INT64 =>
              val v = entry.getLong(0, 0)
              ann match {
                case t: TimestampLogicalTypeAnnotation => t.getUnit match {
                  case TimeUnit.MICROS => v
                  case TimeUnit.MILLIS => v * 1000L
                  case TimeUnit.NANOS => Math.floorDiv(v, 1000L)
                }
                case _ => elemType match {
                  case DoubleType => v.toDouble
                  case d: DecimalType => decimalOf(v, fileScaleOf(ann, d), d)
                  case _ => v
                }
              }
            case PrimitiveTypeName.FLOAT =>
              val v = entry.getFloat(0, 0)
              elemType match { case DoubleType => v.toDouble; case _ => v }
            case PrimitiveTypeName.DOUBLE => entry.getDouble(0, 0)
            case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
              val bytes = entry.getBinary(0, 0).getBytes
              elemType match {
                case StringType => UTF8String.fromBytes(bytes)
                case d: DecimalType => decimalOf(bytes, fileScaleOf(ann, d), d)
                case _ => bytes
              }
            case other => throw new UnsupportedOperationException(
              s"$who: unsupported list element type $other")
          }
        }
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
