package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted, MERGEABLE table-profile store: each ingest drop contributes
  * one constant-size partial-stats row per column; corpus-level stats are
  * served by merging the stored partials — the corpus is never rescanned.
  *
  * The q106/q129 build/serve discipline applied to `Profile` (ANALYZE
  * stats): a 100 TB pipeline wants drop-health numbers per daily drop AND
  * corpus-level stats after every append, but re-profiling the corpus is
  * an O(corpus) scan for an O(1)-sized answer. Every statistic stored
  * here is an exact algebraic merge or a mergeable sketch:
  *
  *   - `n_rows`, `n_nonnull` — exact longs, merge = sum;
  *   - `min` / `max` — exact, merge = min/max IN THE COLUMN'S TYPE
  *     (stored typed: `min_l/max_l` for integer columns, `min_s/max_s`
  *     for strings — a lexicographic merge of stringified numbers would
  *     order "9" > "10");
  *   - `buckets` — the occupied md5-bucket set (first 3 hex chars, ≤ 4096
  *     entries): merge = set union, giving the same exact, engine-portable
  *     LOWER bound on distinct counts as `Profile.tableApprox`
  *     (union-of-drop-sets ≡ set-of-union, so the served bound equals the
  *     single-scan bound bit-for-bit — the q136 oracle replays it over the
  *     whole corpus);
  *   - `hll` — a DataSketches HLL sketch (`hll_sketch_agg`): merge =
  *     `hll_union_agg` (register-wise max — commutative/associative, so
  *     the estimate is independent of drop order). Not SQL-replayable,
  *     so the q136 gate folds the estimate into the q115 certified-bounds
  *     boolean.
  *
  * Column contract (the engine's determinism rule): exact integers and
  * strings only — floor doubles to cents, cast dates/timestamps to
  * days/micros FIRST. Enforced against the schema, not documented-only.
  *
  * Scale shape: `partials` is ONE partial/final aggregation over the drop
  * (no Expand — every aggregate is constant-size, the q115 plan shape);
  * the store grows one row per column per drop, so `serve` reads
  * O(drops × columns) rows regardless of corpus size. `drop_id` is the
  * idempotency key: appending an already-stored drop id is refused, so a
  * crash-retry cannot double-count a drop (staged commits keep the
  * refusal meaningful — see [[appendStaged]]).
  */
object ProfileStore extends DropLedger {

  protected def tableName: String = "partials"
  protected def kind: String = "profile store"

  /** Historical alias for [[tablePath]] (the table predates the shared
    * lifecycle's naming).
    */
  def partialsPath(storeDir: String): String = tablePath(storeDir)

  private def kinds(df: DataFrame, cols: Seq[String]): Map[String, String] = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"profile column names must be plain identifiers, got: ${cols.mkString(", ")}")
    cols.map { c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => c -> "i"
        case StringType => c -> "s"
        case t => throw new IllegalArgumentException(
          s"ProfileStore profiles exact integer and string columns; '$c' is $t " +
            "— floor doubles to cents / cast dates to days first")
      }
    }.toMap
  }

  /** One mergeable partial row per profiled column of this drop:
    * (drop_id, column_name, kind, n_rows, n_nonnull, min_l, max_l,
    * min_s, max_s, buckets, hll). One scan, constant-size aggregates.
    */
  def partials(df: DataFrame, cols: Seq[String], dropId: String): DataFrame = {
    requireDropId(dropId)
    val kind = kinds(df, cols)
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__c$i"),
        min(col(c)).as(s"__mn$i"), max(col(c)).as(s"__mx$i"),
        collect_set(substring(md5(col(c).cast("string")), 1, 3)).as(s"__b$i"),
        expr(s"hll_sketch_agg(CAST($c AS STRING))").as(s"__h$i"))
    }
    val typed = df.agg(aggs.head, aggs.tail: _*).select(
      col("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
        val isInt = kind(c) == "i"
        Seq(col(s"__c$i"),
          (if (isInt) col(s"__mn$i").cast("long")
           else lit(null).cast("long")).as(s"__mnl$i"),
          (if (isInt) col(s"__mx$i").cast("long")
           else lit(null).cast("long")).as(s"__mxl$i"),
          (if (isInt) lit(null).cast("string")
           else col(s"__mn$i").cast("string")).as(s"__mns$i"),
          (if (isInt) lit(null).cast("string")
           else col(s"__mx$i").cast("string")).as(s"__mxs$i"),
          col(s"__b$i"), col(s"__h$i"))
      }: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', '${kind(c)}', __n, __c$i, __mnl$i, __mxl$i, __mns$i, __mxs$i, __b$i, __h$i"
    }.mkString(", ")
    typed.select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, kind, n_rows, n_nonnull, min_l, max_l, min_s, max_s, buckets, hll)"))
      .select(lit(dropId).as("drop_id"), col("*"))
  }

  /** Bootstrap the store from the first drop (overwrites). */
  def build(df: DataFrame, cols: Seq[String], storeDir: String,
            dropId: String): Unit =
    buildStaged(df, cols, storeDir, dropId)()

  /** [[build]] split into compute-now / commit-later — the shared
    * [[DropLedger]] staged-build discipline: the partial row lands in a
    * staging dir NOW; the store only starts existing when the commit
    * thunk runs.
    */
  def buildStaged(df: DataFrame, cols: Seq[String], storeDir: String,
                  dropId: String): () => Unit =
    stagePartialsBuild(partials(df, cols, dropId), storeDir,
      coalesceTo = Some(1)).commit

  /** Add a new drop's partials (staged; commit AFTER the drop's own
    * output write succeeds). Refuses an already-stored `dropId` — the
    * merge is a sum, so double-appending a drop would silently
    * double-count it; the drop id is the idempotency key a retrying
    * pipeline leans on. The commit is ONE rename into a `drop-<id>/`
    * subdirectory ([[StoreSwap.commitDropDir]]), so a crash leaves the
    * drop fully absent or fully present — never half its part-files.
    */
  def appendStaged(df: DataFrame, cols: Seq[String], storeDir: String,
                   dropId: String): () => Unit = {
    val s = df.sparkSession
    requireStore(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(df, cols, dropId), storeDir, dropId,
      coalesceTo = Some(1)).commit
  }

  def append(df: DataFrame, cols: Seq[String], storeDir: String,
             dropId: String): Unit =
    appendStaged(df, cols, storeDir, dropId)()

  /** Corpus-level profile from the stored partials only — never touches
    * the corpus: (column_name, n_rows, n_nulls, n_distinct_lo,
    * n_distinct_approx, min_s, max_s). Exact fields merge exactly
    * (sums/typed min-max/bucket union); `n_distinct_approx` is the merged
    * HLL estimate. `collect_list(buckets)` is bounded: ≤ 4096 entries per
    * stored row, O(drops) rows per column.
    */
  def serve(s: SparkSession, storeDir: String): DataFrame = {
    requireStore(s, storeDir)
    load(s, storeDir)
      .groupBy(col("column_name"), col("kind"))
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_nonnull")).as("nn"),
        min(col("min_l")).as("mnl"), max(col("max_l")).as("mxl"),
        min(col("min_s")).as("mns"), max(col("max_s")).as("mxs"),
        size(array_distinct(flatten(collect_list(col("buckets")))))
          .cast("long").as("n_distinct_lo"),
        expr("hll_sketch_estimate(hll_union_agg(hll))").as("n_distinct_approx"))
      .select(col("column_name"),
        col("n_rows").cast("long").as("n_rows"),
        (col("n_rows") - col("nn")).cast("long").as("n_nulls"),
        col("n_distinct_lo"), col("n_distinct_approx"),
        when(col("kind") === "i", col("mnl").cast("string"))
          .otherwise(col("mns")).as("min_s"),
        when(col("kind") === "i", col("mxl").cast("string"))
          .otherwise(col("mxs")).as("max_s"))
  }

  /** Per-drop, per-column DRIFT report from the stored partials only —
    * the drop-health trend a daily-ingest pipeline watches: (drop_id,
    * column_name, n_rows, null_ppm, n_distinct_lo, min_s, max_s) plus
    * deltas (d_rows, d_null_ppm, d_distinct_lo) against the PREVIOUS drop
    * in drop_id order (use sortable drop ids — dates — for a meaningful
    * order; the first drop's deltas are null). A null-rate jump or a
    * distinct-count collapse between consecutive drops is the truncated-
    * load / schema-drift signal `Profile`'s single-table stats can't see.
    *
    * Complementary to `Audit.tableDiff` (row-level diff of two corpus
    * VERSIONS): drift reads O(drops × columns) stored partial rows and
    * never touches the corpus. The lag window partitions by column over
    * drops — bounded by drop count, never data size. All values exact
    * integers/strings (null_ppm = integer ppm), so the report is
    * hash-gated (q138).
    */
  def drift(s: SparkSession, storeDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireStore(s, storeDir)
    val w = Window.partitionBy(col("column_name")).orderBy(col("drop_id"))
    load(s, storeDir)
      .select(col("drop_id"), col("column_name"),
        col("n_rows").cast("long").as("n_rows"),
        when(col("n_rows") === 0, lit(0L))
          .otherwise(expr("((n_rows - n_nonnull) * 1000000) div n_rows"))
          .as("null_ppm"),
        size(col("buckets")).cast("long").as("n_distinct_lo"),
        when(col("kind") === "i", col("min_l").cast("string"))
          .otherwise(col("min_s")).as("min_s"),
        when(col("kind") === "i", col("max_l").cast("string"))
          .otherwise(col("max_s")).as("max_s"))
      .withColumn("d_rows", col("n_rows") - lag(col("n_rows"), 1).over(w))
      .withColumn("d_null_ppm", col("null_ppm") - lag(col("null_ppm"), 1).over(w))
      .withColumn("d_distinct_lo",
        col("n_distinct_lo") - lag(col("n_distinct_lo"), 1).over(w))
  }

  // Takedown (exact: every stored statistic is a per-drop partial under
  // an algebraic merge — sums, typed min/max, bucket-set union, HLL
  // register-max — so deleting the drop's rows makes serve/drift report
  // EXACTLY the never-ingested state; q140's gate replays that) and
  // compaction are the inherited DropLedger lifecycle.
}
