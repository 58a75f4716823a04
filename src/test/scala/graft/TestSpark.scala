package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole (forked) test JVM. */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("graft-test", Some("local[4]"))
  val Sf: String = "/root/testdata/sf0.001"
}
