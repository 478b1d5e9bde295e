package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-keyed operators over event streams (batch forms; streaming
  * equivalents live in graft.streaming). These re-express the reference's
  * interval-join stage (GATK IndelRealigner reads-vs-target-intervals,
  * daas-apps `preprocessing/RealignIndels.java:19-49`, SURVEY.md O7) on
  * record-level time intervals.
  */
object Events {

  /** Interval/range join via BUCKETED EQUI-JOIN — the scale-path rewrite of
    * the naive O(n·m) broadcast-nested-loop θ-join (SURVEY.md §7.3.2).
    *
    * Each opener row opens the window `(ts, ts + windowSec]`; each probe row
    * is bucketed by `floor(ts / windowSec)`. Because the window length
    * equals the bucket width, a window overlaps exactly buckets {b, b+1} of
    * its opening bucket, so each opener is exploded into two probe-bucket
    * keys and joined EQUI on (key, bucket) — a plain shuffled hash join that
    * partitions evenly at any scale — then the exact range predicate filters
    * within the bucket. Each probe matches through exactly one arm (its own
    * bucket), so no dedup pass is needed.
    *
    * Returns per-opener match counts (openers with zero matches kept, 0).
    */
  def windowedMatchCount(
      openers: DataFrame, probes: DataFrame, key: String,
      windowSec: Long, openerId: String = "event_id"): DataFrame = {
    val usec = windowSec * 1000000L
    val o = openers
      .select(col(openerId), col(key), unix_micros(col("ts")).as("o_us"))
      .withColumn("bucket", explode(array(
        floor(col("o_us") / usec), floor(col("o_us") / usec) + 1)))
    val p = probes
      .select(col(key), unix_micros(col("ts")).as("p_us"))
      .withColumn("bucket", floor(col("p_us") / usec))
    o.join(p,
        Seq(key, "bucket"), "left")
      .withColumn("hit",
        when(col("p_us") > col("o_us") && col("p_us") <= col("o_us") + usec, 1)
          .otherwise(0))
      // group by (key, openerId), not openerId alone: opener ids need only
      // be unique PER KEY (composite identity after per-source ingestion);
      // a global groupBy would silently merge two keys' counts on an id
      // collision, and without the key in the output the collision would
      // be undetectable downstream
      .groupBy(col(openerId), col(key))
      .agg(sum(col("hit")).cast("long").as("n_matches"))
  }

  /** As-of join: for each `right` row, the greatest `left` timestamp ≤ its
    * own, per key — the classic "latest state as of t" lookup, implemented
    * as a single sort-merge-style window pass (one shuffle on key, no
    * self-join): union both sides, order by (ts, side) with left first so
    * equal timestamps are visible, and carry the last left ts forward.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               rightId: String = "event_id"): DataFrame = {
    // checked up front: the long cast below would silently null every
    // string (UUID) id — same contract as Packing.greedyPack
    require(Packing.isIntegralId(right, rightId),
      s"asOfJoin needs an integral $rightId (got " +
        s"${right.schema(rightId).dataType.simpleString}); " +
        "map string ids to longs first (e.g. withDenseId)")
    val lu = left.select(col(key), unix_micros(col("ts")).as("ts_us"),
      lit(0).as("side"), lit(null).cast("long").as("rid"))
    val ru = right.select(col(key), unix_micros(col("ts")).as("ts_us"),
      lit(1).as("side"), col(rightId).cast("long").as("rid"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("ts_us").asc, col("side").asc, col("rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("asof_ts_us",
        last(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("rid").as(rightId), col(key), col("ts_us"), col("asof_ts_us"))
  }

  /** Ordered funnel: for each key, the earliest `stages.head` event, then
    * for each later stage the earliest event of that type STRICTLY after
    * the previous stage's chosen event and within `withinSec` of it.
    * Returns one row per key that entered the funnel: the chosen
    * timestamp per stage (µs, null once the funnel breaks) and the
    * 1-based `stage` reached.
    *
    * Scale shape: one aggregation per stage, all shuffles on the SAME key
    * (the first shuffle co-partitions; later stages reuse the
    * partitioning), no window over the event stream, no self-join
    * explosion — per-stage cost is a partial-agg'd conditional min over
    * the events of keys still in the funnel. Stage count is the query's
    * depth, not the data's.
    */
  def funnel(events: DataFrame, key: String, stages: Seq[String],
             withinSec: Long): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    // stage names become "<stage>_us" output columns — same identifier
    // contract as Profile.table, checked for the same reason (a dotted
    // name parses as struct access; "stage" collides with the output)
    require(stages.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"funnel stage names must be plain identifiers, got: ${stages.mkString(", ")}")
    require(!stages.contains("stage") && key != "stage",
      "'stage' is reserved for the output column")
    val usec = withinSec * 1000000L
    val ev = events.select(col(key), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val entered = ev.filter(col("event_type") === stages.head)
      .groupBy(col(key))
      .agg(min(col("us")).as(s"${stages.head}_us"))
    stages.zipWithIndex.drop(1).foldLeft(entered) { case (acc, (st, i)) =>
      val prev = col(s"${stages(i - 1)}_us")
      val carried = acc.columns.filter(_ != key).map(col)
      // join only THIS stage's events: the filter prunes the per-stage
      // shuffle to one event type and pushes into the parquet scan; the
      // left join still keeps keys with no stage-st events (null min)
      acc.join(ev.filter(col("event_type") === st).drop("event_type"),
          Seq(key), "left")
        .groupBy((col(key) +: carried): _*)
        .agg(min(when(col("us") > prev && col("us") <= prev + usec, col("us")))
          .as(s"${st}_us"))
    }.withColumn("stage",
      stages.tail.map(st => when(col(s"${st}_us").isNotNull, 1).otherwise(0))
        .foldLeft(lit(1))(_ + _).cast("int"))
  }

  /** Cohort retention: each key is anchored to the date of its first
    * `anchorType` event (its cohort day); for every (cohort day, day
    * offset >= 0) pair, the number of DISTINCT keys active on that day.
    * Keys without an anchor event are excluded; activity before the
    * anchor is excluded.
    *
    * Scale shape: one shuffle on key for the anchor min, an equi join on
    * key (cohort frame is one row per key — broadcasts when small, SMJ
    * co-partitioned with the agg otherwise), a distinct on (key, cohort,
    * offset) — the per-key daily activity set, bounded by days-per-key —
    * and a final partial-agg'd count. Output rows are cohorts × offsets,
    * tiny at any corpus scale.
    */
  def retention(events: DataFrame, key: String, anchorType: String): DataFrame = {
    val ev = events.select(col(key), to_date(col("ts")).as("day"),
      col("event_type"))
    val cohort = ev.filter(col("event_type") === anchorType)
      .groupBy(col(key)).agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq(key))
      .filter(col("day") >= col("cohort_day"))
      .select(col(key), col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("offset_day"))
      .distinct()
      .groupBy(col("cohort_day").cast("string").as("cohort_day"), col("offset_day"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** End-of-time sentinel for open SCD2 intervals: 2^62 µs. An explicit
    * long (not null) so interval predicates stay two-sided and engines
    * never disagree on null-comparison semantics.
    */
  val EndOfTimeUs: Long = 4611686018427387904L

  /** SCD2 dimension build: collapse a change-event stream into validity
    * intervals — one row per change carrying its attribute and
    * [valid_from_us, valid_to_us), where valid_to is the NEXT change's
    * timestamp for the same key (EndOfTimeUs for the current row). The
    * (ts, id) ordering is total, so simultaneous changes produce a
    * deterministic zero-length interval for the earlier id rather than an
    * engine-dependent winner.
    *
    * Scale shape: one shuffle on key + one lead() window per key partition
    * — intervals per key are bounded by that key's change count, never
    * corpus-wide. The standard "type-2 slowly changing dimension" build a
    * feature pipeline runs before any point-in-time join.
    */
  def scd2(changes: DataFrame, key: String, attr: org.apache.spark.sql.Column,
           attrName: String, idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col("__us").asc, col(idCol).asc)
    changes
      .select(col(key), unix_micros(col("ts")).as("__us"), col(idCol),
        attr.as(attrName))
      .withColumn("valid_to_us",
        coalesce(lead(col("__us"), 1).over(w), lit(EndOfTimeUs)))
      .select(col(key), col(attrName), col("__us").as("valid_from_us"),
        col("valid_to_us"))
  }

  /** Point-in-time join: each fact row picks up the dimension attributes
    * valid AT its timestamp — `valid_from_us <= ts < valid_to_us` — the
    * feature-store correctness join (training examples must see the
    * feature value as of the event, never a later one; an ordinary join
    * to "current" dimension rows leaks the future).
    *
    * Implemented as an EQUI join on the key with the interval predicate as
    * a post-filter — NOT a generic range join: SCD2 intervals partition
    * each key's timeline, so each fact matches at most one dimension row,
    * the join shuffles only on the key (co-partitioning with everything
    * else keyed the same way), and per-key work is facts × that key's
    * intervals (bounded by change counts, not corpus size).
    */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, key: String,
                      factId: String = "event_id"): DataFrame = {
    val f = facts.select(col(factId), col(key), unix_micros(col("ts")).as("__us"))
    f.join(dim, Seq(key))
      .filter(col("__us") >= col("valid_from_us") &&
        col("__us") < col("valid_to_us"))
      .drop("__us")
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapSec`. Two window passes over
    * one shuffle on key. Returns per-key (n_sessions, n_events).
    */
  def sessionize(events: DataFrame, key: String, gapSec: Long): DataFrame = {
    val usec = gapSec * 1000000L
    val ord = Window.partitionBy(col(key)).orderBy(col("ts_us").asc, col("event_id").asc)
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(key), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(ord) <= usec, 0).otherwise(1))
      .withColumn("sess_id", sum(col("new_sess")).over(cum))
      .groupBy(col(key))
      .agg(max(col("sess_id")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }
}
