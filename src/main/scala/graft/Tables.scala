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

  /** events.ts normalized to Spark TimestampType whatever the writer
    * emitted — the driver has regenerated this table with different
    * parquet timestamp annotations across rounds:
    *  - TIMESTAMP(NANOS): with spark.sql.legacy.parquet.nanosAsLong the
    *    nanos arrive as longs, floor-divided to µs with INTEGER division —
    *    exact, identical to DuckDB's epoch_us truncation;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; the cast keeps the wall-clock (session tz is pinned
    *    UTC in Sessions.local), so unix_micros sees the same integer DuckDB's
    *    epoch_us reads off the naive value;
    *  - TIMESTAMP(MICROS, UTC): already TimestampType, no-op.
    */
  def events: DataFrame = Tables.normalizeTs(t("events"), "ts")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** Normalize a timestamp-ish column (long nanos / TIMESTAMP_NTZ /
    * TIMESTAMP) to TimestampType. Shared by the batch catalog and the
    * streaming specs so both read the same instant whatever the parquet
    * writer annotated. See `Tables.events`.
    */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType =>
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ carries no zone: the cast interprets the wall-clock in the
        // SESSION zone, so it is instant-preserving only under UTC
        // (Sessions.local pins it). Assert rather than let a non-UTC
        // caller silently shift every event by their local offset.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(Set("UTC", "Etc/UTC", "GMT", "Z", "+00:00").contains(tz),
          s"normalizeTs reads TIMESTAMP_NTZ as UTC wall-clock but session " +
            s"timeZone is '$tz' — set spark.sql.session.timeZone=UTC")
        df.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
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
      // MEASURED REJECTION (r18): a session-wide 64 KB
      // adaptive.coalescePartitions.minPartitionSize floor (to spread
      // compute-dense small-byte stages — q108's exact-verify join runs
      // as ONE 3.4 s task under the 1 MB default, tools.Attr) was tried
      // and REVERTED: it un-coalesces every metadata-scale stage too,
      // and the many-stage spine family pays ~30 extra tasks per stage
      // across ~70 stages — q186 5.45 -> 9.14 s, q189 5.42 -> 8.03 s
      // (QBench min-of-3). CPU-dense operators get explicit per-operator
      // parallelism at the spot where bytes misprice compute instead.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Let the planner pick SHUFFLED HASH over sort-merge when its size
      // conditions hold (optimization guide §3.1/§9): both sides still
      // shuffle, but the probe side skips a full sort — measured r17
      // (tools.TriBench, min-of-3, one JVM): q103 9.16→5.57 s,
      // q108 5.48→5.18 s. (The r17 TriBench q114 5.05→4.36 reading did
      // NOT reproduce in the driver bench — 3.9→4.0, flat: q114's plan
      // is broadcast-join-heavy, so this flag was never going to move
      // it; its real fix landed in r18, see containmentJoinExact.)
      // Suite-wide delta in OPTIMIZATION_r17.md. Scale caveat (ADVICE
      // r17): the caps below bound the AQE REWRITE path only —
      // statically-planned SHJ still trusts plan-stat ESTIMATES
      // (autoBroadcastJoinThreshold × shuffle partitions), which can be
      // badly wrong after complex operators, and an SHJ build side
      // cannot spill the way sort-merge does. Cluster submits with
      // untrusted inputs should validate build-side stats or keep
      // preferSortMergeJoin=true (README). The AQE skew-join splitting
      // applies to SHJ too, and the runtime rewrite below is capped at
      // 128 MB of build-side bytes per post-shuffle partition — caps, not
      // core-count-derived constants, so cluster submits inherit them.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "134217728")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // InferFiltersFromGenerate copies a Generate's input expression
      // into an inferred `size(e) > 0 AND isnotnull(e)` filter; filter
      // pushdown then substitutes the DEFINING expression through the
      // adjacent Project, so an explode over a computed array (the
      // winnow family's per-gram md5 transform) re-evaluates the whole
      // array computation PER INPUT ROW inside the scan filter — even
      // for rows an earlier cheap predicate already excluded
      // (subexpression elimination hoists it above the short-circuit).
      // Measured at sf0.1 (tools.GuardProbe, min-of-3): q208's shape
      // 8.9 -> 1.65 s with the rule excluded; an empty-cohort branch
      // 7.9 -> 0.5 s. What the rule buys elsewhere — pruning empty
      // arrays BEFORE a generate — is near-zero here: exploding an
      // empty array already emits nothing, and `size(col) > 0` never
      // reaches parquet footer stats. Cluster deployments should carry
      // this conf alongside spark.sql.extensions (README).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
