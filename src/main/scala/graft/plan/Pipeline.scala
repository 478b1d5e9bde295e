package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Config-gated pipeline algebra: the engine's re-expression of the
  * reference's `Properties`-driven stage planner (daas-apps
  * `SparkCaller.java` `maybe*` methods :71-116,143-168,251-274,296-317 and
  * `MiscUtils.loadConfigFile:44-64`, SURVEY.md O18/O19).
  *
  * A `Stage` is a declarative DataFrame→DataFrame transform; `Plan.build`
  * folds the enabled stages into ONE lazy plan — no per-stage collect()
  * barrier (the reference materializes to the driver after every stage,
  * `SparkCaller.java:98,111,154,172,260,310`, its main scale limiter).
  * Catalyst then optimizes across stage boundaries: a later stage's filter
  * pushes below an earlier stage's projection, etc.
  */
sealed trait Stage {
  def name: String
  def apply(df: DataFrame): DataFrame
}

object Stage {

  /** O1 analog: global sort. */
  final case class Sort(keys: Seq[Column]) extends Stage {
    val name = "sort"
    def apply(df: DataFrame): DataFrame = df.orderBy(keys: _*)
  }

  /** O2 analog: constant/derived column overwrite. Takes a Seq, NOT a
    * Map: columns are applied IN ORDER, and with a Map the iteration
    * order of 5+ entries is hash-arbitrary — a projection where one
    * column reads another it also overwrites would be
    * order-nondeterministic, in the module whose whole point is
    * deterministic config-gated plans.
    */
  final case class Project(cols: Seq[(String, Column)]) extends Stage {
    val name = "project"
    def apply(df: DataFrame): DataFrame =
      cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  /** O3 analog: flag (not drop) duplicates, best-by-quality survivor with
    * total tie-break.
    */
  final case class MarkDuplicates(groupKeys: Seq[Column], quality: Column,
                                  tieBreak: Seq[Column]) extends Stage {
    val name = "markDuplicates"
    def apply(df: DataFrame): DataFrame = {
      val w = Window.partitionBy(groupKeys: _*)
        .orderBy(quality.desc +: tieBreak.map(_.asc): _*)
      df.withColumn("is_dup", when(row_number().over(w) > 1, 1).otherwise(0))
    }
  }

  /** Generic filter stage. */
  final case class Filter(cond: Column) extends Stage {
    val name = "filter"
    def apply(df: DataFrame): DataFrame = df.filter(cond)
  }

  /** O5/O6/O9 analog: aggregate a side table and broadcast-join the result
    * back (the reference's collect()+HashMap-in-closure pattern,
    * `SparkCaller.java:276-283`, without the driver barrier).
    */
  final case class BroadcastApply(dim: DataFrame, keys: Seq[String]) extends Stage {
    val name = "broadcastApply"
    def apply(df: DataFrame): DataFrame = df.join(broadcast(dim), keys, "left")
  }

  /** Custom stage escape hatch (O13-style opaque analytics). */
  final case class Custom(name: String, f: DataFrame => DataFrame) extends Stage {
    def apply(df: DataFrame): DataFrame = f(df)
  }
}

/** Stage gating: a stage runs iff its key is present in the config —
  * exactly the reference's `Properties`-presence semantics; absent stages
  * are elided at plan-construction time (no no-op nodes reach Catalyst).
  */
final case class Plan(stages: Seq[(String, Stage)]) {

  def enabled(config: Map[String, String]): Seq[Stage] =
    stages.collect { case (key, s) if config.contains(key) => s }

  /** Compose enabled stages into one lazy plan. */
  def build(input: DataFrame, config: Map[String, String]): DataFrame =
    enabled(config).foldLeft(input)((df, s) => s(df))
}
