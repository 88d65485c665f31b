package graft.sources

import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** parquet-java `Group` → Spark internal value conversion, shared by
  * every engine reader that walks parquet records outside Spark's own
  * scan (the `graft-changes` stream and the `graft` batch source).
  * One definition, so the two readers cannot drift on type mapping.
  *
  * Supported physical types: BOOLEAN, INT32 (int/date/decimal), INT64
  * (long/timestamp MICROS|MILLIS|NANOS/decimal), INT96 (legacy
  * timestamp), FLOAT, DOUBLE, BINARY/FLBA (string/bytes/decimal).
  * Supported NESTED shapes, fully recursive: 3-level LIST, MAP
  * (key_value layout), and plain-group STRUCT — arrays of structs of
  * maps of arrays all decode, because every nested value routes back
  * through one recursive dispatcher. Struct fields are matched BY NAME
  * against the file group's own schema and null-filled when absent
  * (the same schema-evolution null-fill the top-level reader applies
  * to whole columns). Unsupported shapes are refused with a named
  * error rather than decoded wrongly; `who` labels the failing reader
  * and file. */
private[graft] object ParquetGroups {

  /** Open-time shape gate for readers: the declared Catalyst type
    * matches the file column's TOP-LEVEL parquet shape (list vs map vs
    * struct vs primitive). Deep mismatches are refused by [[convert]]
    * at first touch with the same named-error discipline. */
  def shapeCompatible(t: org.apache.parquet.schema.Type, dt: DataType): Boolean =
    if (t.isPrimitive) true
    else t.getLogicalTypeAnnotation match {
      case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation => dt.isInstanceOf[ArrayType]
      case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation => dt.isInstanceOf[MapType]
      case _ => dt.isInstanceOf[StructType]
    }

  /** The LEAF Catalyst types this reader can produce. A mismatch here
    * means the declared schema types a slot differently than the file
    * stores it — refuse loudly: decoding a raw physical value into a
    * differently-typed slot would serve silently wrong data. */
  private def checkLeaf(to: DataType, who: => String): Unit = to match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         DateType | TimestampType | TimestampNTZType | StringType | BinaryType => ()
    case _: DecimalType => ()
    case other => throw new UnsupportedOperationException(
      s"$who: unsupported Catalyst leaf type $other for the low-level parquet reader")
  }

  /** Physical/declared pair refusal — the file stores one thing, the
    * declared schema asks for an incompatible slot: decoding anyway
    * would either serve a wrong value or crash later as an unnamed
    * ClassCastException deep inside execution. */
  private def refuse(physical: String, declared: DataType, who: => String): Nothing =
    throw new UnsupportedOperationException(
      s"$who: file stores $physical but the declared schema asks for " +
      s"${declared.catalogString} — incompatible leaf pair")

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
  def convert(g: Group, fi: Int, to: DataType, who: => String): Any =
    convertValueAt(g, fi, 0, to, who)

  /** Occurrence `idx` of field `fi` in `parent`, recursively: the one
    * dispatcher every nesting level routes through. */
  private def convertValueAt(parent: Group, fi: Int, idx: Int,
      to: DataType, who: => String): Any = {
    val ft = parent.getType.getType(fi)
    if (ft.isPrimitive) convertPrimitiveAt(parent, fi, idx, to, who)
    else ft.getLogicalTypeAnnotation match {
      case _: LogicalTypeAnnotation.ListLogicalTypeAnnotation =>
        convertListGroup(parent.getGroup(fi, idx), to, who)
      case _: LogicalTypeAnnotation.MapLogicalTypeAnnotation =>
        convertMapGroup(parent.getGroup(fi, idx), to, who)
      case _ => // un-annotated group = STRUCT
        convertStruct(parent.getGroup(fi, idx), to, who)
    }
  }

  /** Primitive occurrence `idx` of field `fi` — the leaf conversion
    * rules, shared by every nesting level. */
  private def convertPrimitiveAt(g: Group, fi: Int, idx: Int,
      to: DataType, who: => String): Any = {
    checkLeaf(to, who)
    val pt = g.getType.getType(fi).asPrimitiveType()
    val ann = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case PrimitiveTypeName.BOOLEAN =>
        to match {
          case BooleanType => g.getBoolean(fi, idx)
          case other => refuse("BOOLEAN", other, who)
        }
      case PrimitiveTypeName.INT32 =>
        val v = g.getInteger(fi, idx)
        to match {
          case LongType => v.toLong
          case DoubleType => v.toDouble
          case d: DecimalType => decimalOf(v.toLong, fileScaleOf(ann, d), d)
          case IntegerType | DateType => v // days share the int repr
          case other => refuse("INT32", other, who)
        }
      case PrimitiveTypeName.INT64 =>
        val v = g.getLong(fi, idx)
        (ann, to) match {
          // unit rescaling applies ONLY when the declared slot is a
          // timestamp: a LongType declaration over a timestamp-
          // annotated column means the caller wants the RAW physical
          // value (the engine's own nanosAsLong pattern) — rescaling
          // into a long slot would serve silently 1000x-off numbers
          // TimestampNTZType rescales identically: the NTZ/instant
          // distinction is about zone interpretation, not the file's
          // physical unit — a MILLIS-annotated file read as declared
          // NTZ must still be scaled to micros, or it serves 1000x-off
          case (t: TimestampLogicalTypeAnnotation, TimestampType | TimestampNTZType) => t.getUnit match {
            case TimeUnit.MICROS => v
            case TimeUnit.MILLIS => v * 1000L
            // truncate toward zero, matching the `div` derivation in
            // Tables.events and NanosRangeRewrite's bound math — the
            // two readers must agree on pre-epoch values too
            case TimeUnit.NANOS => v / 1000L
          }
          case _ => to match {
            case DoubleType => v.toDouble
            case d: DecimalType => decimalOf(v, fileScaleOf(ann, d), d)
            case LongType | TimestampType | TimestampNTZType => v
            case other => refuse("INT64", other, who)
          }
        }
      case PrimitiveTypeName.INT96 =>
        // legacy impala layout: 8B nanos-of-day LE + 4B julian day LE
        val b = g.getInt96(fi, idx).getBytes
        val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanosOfDay = buf.getLong
        val julianDay = buf.getInt
        (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
      case PrimitiveTypeName.FLOAT =>
        val v = g.getFloat(fi, idx)
        to match {
          case DoubleType => v.toDouble
          case FloatType => v
          case other => refuse("FLOAT", other, who)
        }
      case PrimitiveTypeName.DOUBLE =>
        to match {
          case DoubleType => g.getDouble(fi, idx)
          case other => refuse("DOUBLE", other, who)
        }
      case PrimitiveTypeName.BINARY | PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY =>
        val bytes = g.getBinary(fi, idx).getBytes
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
    * itself writes for array columns. Null elements surface as nulls;
    * elements recurse (array<struct>, array<array<...>> decode). */
  private def convertListGroup(listGroup: Group, to: DataType, who: => String): Any = {
    val elemType = to match {
      case ArrayType(e, _) => e
      case other => throw new UnsupportedOperationException(
        s"$who: parquet LIST column read as non-array $other")
    }
    val n = listGroup.getFieldRepetitionCount(0)
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val entry = listGroup.getGroup(0, k) // repeated "list" wrapper
      out(k) =
        if (entry.getFieldRepetitionCount(0) == 0) null
        else convertValueAt(entry, 0, 0, elemType, who)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Parquet MAP (`optional group col (MAP) { repeated group key_value
    * { required <key>; <value> } }`) -> Spark MapData. Keys are
    * required by the spec; null values surface as nulls; both sides
    * recurse. */
  private def convertMapGroup(mapGroup: Group, to: DataType, who: => String): Any = {
    val (keyType, valType) = to match {
      case MapType(k, v, _) => (k, v)
      case other => throw new UnsupportedOperationException(
        s"$who: parquet MAP column read as non-map $other")
    }
    val n = mapGroup.getFieldRepetitionCount(0)
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var k = 0
    while (k < n) {
      val kv = mapGroup.getGroup(0, k) // repeated "key_value"
      keys(k) = convertValueAt(kv, 0, 0, keyType, who)
      vals(k) =
        if (kv.getType.getFieldCount < 2 || kv.getFieldRepetitionCount(1) == 0) null
        else convertValueAt(kv, 1, 0, valType, who)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Plain parquet group -> Spark InternalRow under the declared
    * StructType: fields matched BY NAME against the group's own
    * schema; declared fields the file lacks (schema evolution) and
    * present-but-unset fields null-fill. */
  private def convertStruct(sg: Group, to: DataType, who: => String): InternalRow = {
    val st = to match {
      case s: StructType => s
      case other => throw new UnsupportedOperationException(
        s"$who: parquet group column read as non-struct $other")
    }
    val gt = sg.getType
    val out = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      val f = st(i)
      out(i) =
        if (!gt.containsField(f.name)) null
        else {
          val fi = gt.getFieldIndex(f.name)
          if (sg.getFieldRepetitionCount(fi) == 0) null
          else convertValueAt(sg, fi, 0, f.dataType, who)
        }
      i += 1
    }
    new GenericInternalRow(out)
  }
}
