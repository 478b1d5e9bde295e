package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Table catalog over the driver-generated parquet warehouse.
  *
  * Mirrors the reference's "recursive directory scan" source
  * (daas-apps `sparkcaller/.../utils/MiscUtils.java:15-38`) re-expressed as
  * plain partitioned parquet reads: paths appear only at this edge; every
  * operator downstream is a lazy DataFrame transform.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS); Spark's TimestampType is µs, so
    * (with spark.sql.legacy.parquet.nanosAsLong) the nanos arrive as longs
    * and are floor-divided to µs with INTEGER division — exact, and
    * identical to DuckDB's epoch_us truncation.
    */
  def events: DataFrame = {
    val raw = t("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Sessions {
  /** Session defaults tuned for local[32] testing but scale-safe: AQE on
    * (runtime skew/coalesce re-planning replaces the reference's hand-rolled
    * greedy contig bin-packing, `SparkCaller.java:190-243`), shuffle
    * partitions sized to the local core count instead of the 200 default.
    */
  def local(cores: Int = 32): SparkSession = {
    // local[n, 2]: allow ONE task retry, like a real cluster (default
    // local[n] makes any task failure fatal, which both diverges from the
    // deployment the engine targets and turns transient local hiccups into
    // whole-run failures). Operators must stay retry-safe — asserted by
    // FunctionsSpec's injected-failure test.
    val s = SparkSession
      .builder()
      .master(s"local[$cores,2]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
