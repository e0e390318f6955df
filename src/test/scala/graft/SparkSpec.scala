package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all suites (one JVM, small core count). */
object TestSession {
  lazy val spark: SparkSession = Session.local(cores = 4, appName = "graft-test")
}

abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSession.spark
  val Sf = "/root/testdata/sf0.001"
}
