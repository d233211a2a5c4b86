package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM under Test/fork). */
object SparkSpec {
  lazy val spark: SparkSession = Engine.session("local[4]")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  val sf = "/root/testdata/sf0.001"
}
