package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drop-to-drop audit: what changed between two versions of a table. The
  * check a training-data pipeline runs before promoting a new corpus
  * build — unexpected `removed` or `changed_text` counts mean an upstream
  * stage regressed, and the numbers are exact so they diff cleanly
  * against the previous audit.
  */
object Audit {

  /** Summary diff of `v2` vs `v1` by primary key: one row per change
    * kind — `added` (key only in v2), `removed` (only in v1), `changed`
    * (present in both, ≥1 compared column differs, null-safe),
    * `unchanged` — plus one `changed_<col>` row per compared column
    * counting rows where THAT column differs. Output: (change, n).
    *
    * Scale shape: ONE full-outer join on the key (both sides shuffle
    * once, co-partitioned) + ONE aggregation producing a fixed
    * (4 + |cols|)-row summary via stack — nothing row-sized leaves the
    * join stage. Comparisons are null-safe (`<=>`), so a null→value
    * transition counts as a change and null==null does not.
    */
  def tableDiff(v1: DataFrame, v2: DataFrame, key: String,
                cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableDiff needs at least one compared column")
    require((key +: cols).forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      "tableDiff columns must be plain identifiers")
    val a = v1.select(col(key).as("__k") +:
      cols.map(c => col(c).as(s"__a_$c")) :+ lit(1).as("__pa"): _*)
    val b = v2.select(col(key).as("__k") +:
      cols.map(c => col(c).as(s"__b_$c")) :+ lit(1).as("__pb"): _*)
    val j = a.join(b, Seq("__k"), "full_outer")
    val anyChanged = cols.map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
      .reduce(_ || _)
    val kind = when(col("__pa").isNull, lit("added"))
      .when(col("__pb").isNull, lit("removed"))
      .when(anyChanged, lit("changed"))
      .otherwise(lit("unchanged"))
    val flags = j.select(kind.as("__kind") +: cols.map { c =>
      when(col("__pa").isNotNull && col("__pb").isNotNull &&
          !(col(s"__a_$c") <=> col(s"__b_$c")), 1L).otherwise(0L)
        .as(s"__ch_$c")
    }: _*)
    val kindAggs = Seq("added", "removed", "changed", "unchanged").map(k =>
      sum(when(col("__kind") === k, 1L).otherwise(0L)).as(s"__n_$k"))
    val colAggs = cols.map(c => sum(col(s"__ch_$c")).as(s"__n_changed_$c"))
    val wide = flags.agg((kindAggs ++ colAggs).head,
      (kindAggs ++ colAggs).tail: _*)
    val stackArgs = (Seq("added", "removed", "changed", "unchanged")
      .map(k => s"'$k', __n_$k") ++
      cols.map(c => s"'changed_$c', __n_changed_$c")).mkString(", ")
    wide.select(expr(
      s"stack(${4 + cols.size}, $stackArgs) AS (change, n)"))
  }
}
