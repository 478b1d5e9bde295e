package graft.extra

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Group analytics / streaming / range-join / multimodal queries (M3). */
object Queries {
  def all: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
