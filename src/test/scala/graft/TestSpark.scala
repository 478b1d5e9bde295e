package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(4)
}
