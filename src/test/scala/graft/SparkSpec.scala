package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — ONE local session (Sessions.local, the
  * same config as Verify/Bench), reused across suites via the singleton
  * SparkSession machinery. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("graft-test")
}
