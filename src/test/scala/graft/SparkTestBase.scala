package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = graft.core.GraftSession.local(4, "graft-test")
  val sf0001 = "/root/testdata/sf0.001"
}

trait SparkTestBase extends AnyFunSuite {
  // A stable `val` (not a `def`) so `import spark.implicits._` compiles:
  // imports require a stable identifier path.
  protected lazy val spark: SparkSession = SparkTestBase.spark
  protected def sf0001: String = SparkTestBase.sf0001
}
