package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for Spark-touching specs (one JVM-wide session —
  * getOrCreate makes every suite reuse it, so `sbt test` pays startup once). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[2]").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Functions.register(s)
    s
  }
  // no afterAll stop: the session is shared across suites
}
