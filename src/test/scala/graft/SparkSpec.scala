package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for suites (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession =
    GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"), "4"
    )
      // The default ./spark-warehouse outlives the JVM while the Derby
      // metastore does not: a second `sbt test` in the same workspace
      // would hit LOCATION_ALREADY_EXISTS on every saveAsTable. A fresh
      // temp warehouse per JVM keeps catalog and filesystem in sync.
      .config("spark.sql.warehouse.dir",
              java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
}
