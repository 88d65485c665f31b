package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** S10 — conditional unit conversion (SURVEY §2 S10).
  *
  * The reference converts US-customary sensor values to metric per row,
  * per physical type (aristoteles/aristoteles.py:414-436):
  *   pressure    inHg  → hPa    x 33.863886   (:421-424)
  *   temperature °F    → °C     (F-32)*5/9    (:425-428)
  *   speed       mph   → km/h   x 1.609344    (:429-432)
  *   rate/amount in    → mm     x 25.4        (:433-436)
  *   percent, direction: pass through.
  *
  * Two load-bearing quirks, preserved bit-for-bit (SURVEY §7 watch-list):
  *   1. zero-skip: the reference guards with Python truthiness
  *      (`if usUnits and value` at :418-419), so a value of exactly 0 is
  *      NOT converted (0 °F stays 0, not -17.8 °C). We encode `v =!= 0`.
  *   2. NaN is truthy in Python, so NaN IS converted (NaN*k = NaN,
  *      benign). In Spark a NULL comparison yields NULL -> otherwise
  *      branch -> value passes through unchanged, which is observationally
  *      identical (NULL stays NULL, NaN*k = NaN stays NaN via the =!=
  *      branch since NaN != 0 is true in SQL comparisons... Spark treats
  *      NaN as greater than any value and NaN =!= 0 is true, so NaN is
  *      converted, matching Python).
  *
  * Everything is a `when/otherwise` Column expression: whole-stage
  * codegen compiles the full 16-column conversion into one generated
  * function, replacing the reference's O(rows x cols) interpreted loop
  * (aristoteles.py:415-436). At 100 TB this is the difference between a
  * scan-speed map and a driver bottleneck.
  */
object UnitConversions {
  val InhgToHpa: Double = 33.863886
  val MphToKmh: Double = 1.609344
  val InToMm: Double = 25.4

  /** Core guard: convert only when `usFlag` is set and value != 0. */
  def convertIf(usFlag: Column, v: Column)(f: Column => Column): Column =
    when(usFlag && (v =!= lit(0.0)), f(v)).otherwise(v)

  def pressure(usFlag: Column, v: Column): Column =
    convertIf(usFlag, v)(_ * InhgToHpa)

  def temperature(usFlag: Column, v: Column): Column =
    convertIf(usFlag, v)(c => (c - lit(32.0)) * lit(5.0) / lit(9.0))

  def speed(usFlag: Column, v: Column): Column =
    convertIf(usFlag, v)(_ * MphToKmh)

  def amount(usFlag: Column, v: Column): Column =
    convertIf(usFlag, v)(_ * InToMm)

  /** percent / direction: identity (aristoteles.py:56-57 list no factor). */
  def passthrough(v: Column): Column = v

  /** Output unit labels per physical type (aristoteles.py:51-59). */
  val units: Map[String, String] = Map(
    "pressure" -> "hPa",
    "temperature" -> "deg C",
    "percent" -> "%",
    "speed" -> "km/h",
    "direction" -> "deg",
    "rate" -> "mm/hr",
    "amount" -> "mm"
  )

  // The column -> physical-type mapping (aristoteles.py:32-49) lives
  // ONCE, in graft.pipeline.WviewSchema.sensors — the copy that used
  // to sit here was referenced by nothing and could silently drift.

  /** Build the converted projection for one sensor column by type. */
  def convert(physType: String, usFlag: Column, v: Column): Column = physType match {
    case "pressure"         => pressure(usFlag, v)
    case "temperature"      => temperature(usFlag, v)
    case "speed"            => speed(usFlag, v)
    case "rate" | "amount"  => amount(usFlag, v)
    case _                  => passthrough(v)
  }
}
