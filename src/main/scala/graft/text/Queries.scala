package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis / dedup / similarity queries (M2) — filled incrementally. */
object Queries {
  def all: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
