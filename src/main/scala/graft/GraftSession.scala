package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.plan.{Plan, Stage}

/** Programmatic session surface mirroring the reference's intended public
  * API shape — session → configure → preprocess → discover — evidenced by
  * its interactive notebook (daas-apps
  * `sparkcaller/variant_discovery_notebook.ipynb` cells 0-5, SURVEY.md
  * §3.3): each phase returns a DataFrame the user can inspect before
  * continuing, and phases compose into ONE lazy plan when chained (no
  * driver-side materialization between phases — the reference collect()s
  * after every stage, its main scale limiter).
  *
  * {{{
  * val g = GraftSession(spark, config = Map("sort" -> "", "markDuplicates" -> ""))
  * val pre = g.preprocess(input, prePlan)   // lazy
  * val out = g.analyze(pre, analyticPlan)   // still lazy; one Catalyst plan
  * out.write.parquet(...)                   // the only materialization
  * }}}
  */
final case class GraftSession(spark: SparkSession, config: Map[String, String]) {

  /** Run the config-enabled subset of `plan` over `input` — lazily. */
  def preprocess(input: DataFrame, plan: Plan): DataFrame = plan.build(input, config)

  /** Second phase, same mechanics; separate name mirrors the reference's
    * preprocess/discoverVariants split (`SparkCaller.java:125,291`).
    */
  def analyze(input: DataFrame, plan: Plan): DataFrame = plan.build(input, config)

  /** Convenience: tables catalog for a warehouse dir. */
  def tables(dir: String): Tables = Tables(spark, dir)
}

object GraftSession {
  /** Parse a java-properties-style config (the reference's config format,
    * `MiscUtils.loadConfigFile:44-64`): presence of a key enables the
    * stage, the value carries stage arguments.
    */
  def fromProperties(path: String, spark: SparkSession): GraftSession = {
    val props = new java.util.Properties()
    val in = new java.io.FileInputStream(path)
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    GraftSession(spark, props.asScala.toMap)
  }
}
