package graft.pipeline

import org.apache.spark.sql.types._

/** The reference's fixed source schema (aristoteles/aristoteles.py:32-49,
  * :329-330): dateTime (epoch seconds) + usUnits flag + 16 sensor columns,
  * each with a physical type driving unit conversion.
  *
  * We keep sensor values as nullable DoubleType (SQL NULL) internally and
  * only NaN-ify at a sink-parity boundary if ever needed (SURVEY §2 S11).
  */
object WviewSchema {

  /** Sensor column -> physical type, in the reference's declaration order. */
  val sensors: Seq[(String, String)] = Seq(
    "barometer" -> "pressure", "pressure" -> "pressure",
    "altimeter" -> "pressure", "inTemp" -> "temperature",
    "outTemp" -> "temperature", "inHumidity" -> "percent",
    "outHumidity" -> "percent", "windSpeed" -> "speed",
    "windDir" -> "direction", "windGust" -> "speed",
    "windGustDir" -> "direction", "rainRate" -> "rate",
    "rain" -> "amount", "dewpoint" -> "temperature",
    "windchill" -> "temperature", "heatindex" -> "temperature")

  val sensorNames: Seq[String] = sensors.map(_._1)

  /** Full archive-table schema: the 18-column projection of :329-330. */
  val schema: StructType = StructType(
    StructField("dateTime", LongType, nullable = false) ::
    StructField("usUnits", IntegerType, nullable = true) ::
    sensors.map { case (name, phys) =>
      StructField(name, DoubleType, nullable = true,
        new MetadataBuilder()
          .putString("physicalType", phys)
          .putString("units", graft.functions.UnitConversions.units(phys))
          .build())
    }.toList)

  /** Samples per complete UTC day at the fixed 5-minute cadence
    * (README.md:11-13, aristoteles.py:316). */
  val SamplesPerDay: Int = 288
}
