package graft

import org.apache.spark.sql.functions._
import graft.functions.UnitConversions

/** S10 conversion semantics against hand-computed values, including the
  * reference's zero-skip quirk and NaN/NULL flow (SURVEY §7 watch-list 1).
  */
class UnitConversionsSpec extends SparkSpec {
  import spark.implicits._

  private def run(flag: Boolean, v: java.lang.Double,
                  f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Option[Double] = {
    val df = Seq((flag, Option(v).map(_.doubleValue))).toDF("us", "v")
    val out = df.select(f(col("us"), col("v")).as("r")).collect()(0)
    if (out.isNullAt(0)) None else Some(out.getDouble(0))
  }

  test("temperature F->C when flag set") {
    assert(run(flag = true, 212.0, UnitConversions.temperature).get === 100.0)
    assert(run(flag = true, 32.0, UnitConversions.temperature).get === 0.0)
  }

  test("zero-skip: 0 with flag set is NOT converted (aristoteles.py:418-419)") {
    assert(run(flag = true, 0.0, UnitConversions.temperature).get === 0.0)
    assert(run(flag = true, 0.0, UnitConversions.pressure).get === 0.0)
  }

  test("flag unset is identity") {
    assert(run(flag = false, 212.0, UnitConversions.temperature).get === 212.0)
    assert(run(flag = false, 10.0, UnitConversions.speed).get === 10.0)
  }

  test("pressure/speed/amount factors") {
    assert(math.abs(run(flag = true, 1.0, UnitConversions.pressure).get - 33.863886) < 1e-12)
    assert(math.abs(run(flag = true, 1.0, UnitConversions.speed).get - 1.609344) < 1e-12)
    assert(math.abs(run(flag = true, 1.0, UnitConversions.amount).get - 25.4) < 1e-12)
  }

  test("NaN is converted (Python-truthy) and stays NaN; NULL stays NULL") {
    assert(run(flag = true, Double.NaN, UnitConversions.speed).get.isNaN)
    assert(run(flag = true, null, UnitConversions.speed).isEmpty)
  }
}
