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

  /** Order-independent corpus MANIFEST: per md5-shard of the key, exact
    * row count plus two content fingerprints — `bit_xor` of each row's
    * 60-bit md5 fingerprint and the sum of its mod-1000003 residue. The
    * reproducibility certificate for a training corpus: the engine
    * claims byte-identical re-runs everywhere (stores, dedup decisions,
    * shards); this makes the claim checkable in ONE pass — two builds
    * match iff their manifests match (up to fingerprint collision), and
    * a mismatch names the shard to diff with [[tableDiff]].
    *
    * Scale shape: map-only fingerprinting + one partial/final agg with
    * CONSTANT per-shard state (count, xor, sum — all commutative/
    * associative, so the manifest is partitioning- and order-independent
    * by construction, never a sort or collect_list of row hashes). Two
    * fingerprints because they fail differently: xor cancels on twin
    * corruptions, the modular sum shifts; count catches padding. Rows
    * render with a chr(1) field separator and chr(2) for NULL, so
    * adjacent-field ambiguity can't alias two different rows.
    */
  def manifest(df: DataFrame, key: String, cols: Seq[String],
               shards: Int = 8): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require((key +: cols).forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      "manifest columns must be plain identifiers")
    val rendered = concat_ws("\u0001",
      (key +: cols).map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)
    val fp = conv(substring(md5(rendered), 1, 15), 16, 10).cast("long")
    df.select(
        Sampling.hashBucket(col(key), shards, seed = "manifest").as("shard"),
        fp.as("__fp"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__fp)").as("xor_fp"),
        sum(col("__fp") % 1000003L).as("sum_fp"))
  }
}
