package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across suites (getOrCreate hits the same
  * singleton; never stopped mid-run).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.get()
  val sf: String = "/root/testdata/sf0.001"
}
