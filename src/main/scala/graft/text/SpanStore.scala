package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted gram-DF store for the repeated-SPAN family (q120 detection /
  * q125 scrub): each corpus drop contributes one row per distinct k-gram —
  * its within-drop document frequency and minimum doc id — and the
  * corpus-wide span statistics are served by merging the stored partials.
  * This closes the one heavy text family that still recomputed
  * corpus-wide gram df per run: span-detecting or span-scrubbing a NEW
  * drop against the entire ingest history now costs one store scan plus
  * the drop's own grams, with the historical corpus never re-tokenized.
  *
  * Merge disciplines (the fourth store in the family, combining two
  * already-proven ones): document frequency merges by SUM — drops
  * partition the corpus, so distinct-doc counts are additive across
  * drops, exactly `LmStore`'s contract — and the keeper (minimum doc id
  * per gram, q125's survivorship rule) merges by MIN, `GramStore`'s
  * discipline. Both are exact, so store-served spans are bit-identical
  * to running q120/q125 from scratch on the union of every stored drop
  * plus the probe drop (the q150/q151 gates replay exactly that).
  * The doc-disjointness contract is the same one every sum-merge store
  * carries: a doc id ingested under two drop ids would double-count.
  *
  * Takedown ([[removeDrop]]) is exact for the family's usual reason: the
  * rows are PER-DROP partials, so deleting a drop's rows makes the serve
  * re-sum and re-min over what remains — a gram that only recurred
  * because of the removed drop stops being flagged, and a keeper the
  * removed drop held falls back to the surviving minimum (q152's gate).
  *
  * Storage: one parquet table `spangrams` (drop_id, k, gram_key, df_c,
  * min_doc) — gram_key the 16-hex md5 prefix of the word-k-gram (q120's
  * key), one row per DISTINCT gram per drop (gram-type sized, Zipf ≪
  * tokens). `k` is stamped per row and validated single-valued at serve:
  * a store built at k=5 probed at k=7 would silently find no overlap, so
  * the serve side READS k from the store instead of trusting a caller
  * parameter. Layout mirrors [[LmStore]]: bootstrap files at the table
  * root, each appended drop under its own atomically-renamed
  * `drop-<id>/` subdirectory ([[graft.operators.StoreSwap.commitDropDir]]),
  * takedown/compact rewrites flat; `recursiveFileLookup` reads all three.
  */
object SpanStore extends graft.operators.DropLedger {

  protected def tableName: String = "spangrams"
  protected def kind: String = "span store"

  def gramsPath(storeDir: String): String = tablePath(storeDir)

  /** (doc_id, pos, gram_key) — one row per k-gram OCCURRENCE; 1-based
    * positions. The shared head of q120/q125 and every store path.
    */
  private[text] def posRows(docs: DataFrame, k: Int,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"),
        posexplode(TextOps.shingles(col("ws"), k)).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + lit(1)).as("pos"),
        substring(md5(col("gram")), 1, 16).as("gram_key"))

  /** Merge flagged gram positions into maximal spans — the shared tail of
    * q120 and [[detectVsDrop]]. Input: (doc_id, pos, gram_df) rows of
    * FLAGGED occurrences; output: one row per (doc, maximal span).
    * Window partitions by doc — never global.
    */
  private[text] def spanRows(posFlagged: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + lit(k - 1))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    posFlagged
      .withColumn("new_span",
        when(col("pos") > coalesce(prevEnd, lit(-1)) + lit(1), 1).otherwise(0))
      .withColumn("span_id", sum(col("new_span")).over(w))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        count(lit(1)).as("n_grams"),
        max(col("gram_df")).as("max_df"))
      .withColumn("span_toks", col("span_end") - col("span_start") + lit(1))
      .drop("span_id")
  }

  /** Token-wise scrub given elected keepers — the shared tail of q125 and
    * [[scrubVsDrop]]. `d` = (doc_id, ws) for every doc to emit; `pos` =
    * the same docs' gram occurrences; `keepers` = (gram_key, keeper):
    * every occurrence of a kept gram in a doc with id > keeper is
    * deleted token-wise (covered-position union, so overlaps scrub once).
    */
  private[text] def scrubTail(d: DataFrame, pos: DataFrame,
                              keepers: DataFrame, k: Int,
                              eager: Boolean): DataFrame = {
    val cov0 = pos.join(keepers, "gram_key")
      .filter(col("doc_id") > col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("t"))
      .distinct()
    // cov feeds the anti join AND the n_removed agg; small (dup coverage)
    val cov = if (eager) Dedup.materialize(cov0) else cov0
    val toks = d
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("t0", "w")))
      .select(col("doc_id"), (col("t0") + lit(1)).as("t"), col("w"))
    val sc = toks.join(cov, Seq("doc_id", "t"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("t"), col("w")))),
          x => x.getField("w")), " ").as("scrubbed_text"))
    val nrem = cov.groupBy(col("doc_id")).agg(count(lit(1)).as("n_removed"))
    d.select(col("doc_id"), size(col("ws")).as("n_toks"))
      .join(nrem, Seq("doc_id"), "left")
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("scrubbed_text"), lit("")).as("scrubbed_text"))
  }

  /** (drop_id, k, gram_key, df_c, min_doc) for one drop: per distinct
    * gram, its distinct-doc count within the drop and its minimum doc id.
    */
  def partials(docs: DataFrame, dropId: String, k: Int = 5,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    requireDropId(dropId)
    require(k >= 2, s"k must be >= 2, got $k")
    posRows(docs, k, idCol, textCol)
      .groupBy(col("gram_key"))
      .agg(countDistinct(col("doc_id")).as("df_c"),
        min(col("doc_id")).as("min_doc"))
      .select(lit(dropId).as("drop_id"), lit(k).as("k"),
        col("gram_key"), col("df_c"), col("min_doc"))
  }

  /** The store's gram width — stamped at build, validated single-valued
    * so a mismatched probe can never silently miss every gram.
    */
  def storedK(s: SparkSession, storeDir: String): Int = {
    requireStore(s, storeDir)
    val ks = load(s, storeDir).select(col("k")).distinct()
      .collect().map(_.getInt(0))
    require(ks.nonEmpty,
      s"span store $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    require(ks.length == 1,
      s"span store $storeDir holds mixed gram widths ${ks.sorted.mkString(", ")} — corrupt")
    ks.head
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(docs: DataFrame, storeDir: String, dropId: String, k: Int = 5,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    buildStaged(docs, storeDir, dropId, k, idCol, textCol)()

  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  k: Int = 5, idCol: String = "doc_id",
                  textCol: String = "text"): () => Unit =
    stagePartialsBuild(partials(docs, dropId, k, idCol, textCol),
      storeDir).commit

  /** Append a new drop's gram-df partials (staged, single-rename atomic
    * commit). Refuses a stored id — df merges by sum, so a double append
    * double-counts — and a gram width different from the store's.
    */
  def appendStaged(docs: DataFrame, storeDir: String, dropId: String,
                   idCol: String = "doc_id",
                   textCol: String = "text"): () => Unit = {
    val s = docs.sparkSession
    val k = storedK(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(docs, dropId, k, idCol, textCol),
      storeDir, dropId).commit
  }

  def append(docs: DataFrame, storeDir: String, dropId: String,
             idCol: String = "doc_id", textCol: String = "text"): Unit =
    appendStaged(docs, storeDir, dropId, idCol, textCol)()

  /** The merged corpus-wide gram statistics: (gram_key, gram_df, keeper) —
    * df summed and keeper min'd across drops, exactly the stats q120/q125
    * compute from a full corpus scan. One partial/final agg over
    * gram-type-sized partials, partitioned by gram key.
    */
  def serveStats(s: SparkSession, storeDir: String): DataFrame = {
    requireStore(s, storeDir)
    load(s, storeDir).groupBy(col("gram_key"))
      .agg(sum(col("df_c")).as("gram_df"), min(col("min_doc")).as("keeper"))
  }

  /** Repeated-span DETECTION of a new drop against history ∪ drop —
    * bit-identical to q120 on the union corpus, restricted to the drop's
    * docs (the q150 gate): a gram is flagged iff its merged df (stored
    * sum + the drop's own distinct-doc count) reaches `minDf`. Read-only;
    * [[append]] the drop separately once accepted.
    *
    * Scale shape: the drop's gram rows agg once (drop-sized), join the
    * stored stats on the gram key (both sides hash-partition; the stored
    * side is gram-TYPE sized), and the island merge windows per doc —
    * the history contributes one store scan, never a re-tokenize.
    */
  def detectVsDrop(newDocs: DataFrame, storeDir: String, minDf: Int = 2,
                   idCol: String = "doc_id", textCol: String = "text",
                   eager: Boolean = true): DataFrame = {
    val s = newDocs.sparkSession
    val k = storedK(s, storeDir)
    val pos0 = posRows(newDocs, k, idCol, textCol)
    // pos feeds the drop-df agg AND the flag join (nearDupPairs' shared-
    // prep discipline); eager=false keeps analysis job-free on TVF paths
    val pos = if (eager) Dedup.materialize(pos0) else pos0
    val dropDf = pos.groupBy(col("gram_key"))
      .agg(countDistinct(col("doc_id")).as("df_c"))
    val merged = dropDf
      .join(serveStats(s, storeDir).select(col("gram_key"),
        col("gram_df").as("stored_df")), Seq("gram_key"), "left")
      .select(col("gram_key"),
        (col("df_c") + coalesce(col("stored_df"), lit(0L))).as("gram_df"))
      .filter(col("gram_df") >= minDf)
    spanRows(pos.join(merged, "gram_key")
      .select(col("doc_id"), col("pos"), col("gram_df")), k)
  }

  /** Repeated-span SCRUB of a new drop against history ∪ drop —
    * bit-identical to q125 on the union corpus, restricted to the drop's
    * docs (the q151 gate): the keeper of a flagged gram is the minimum
    * doc id across the stored corpus AND the drop, and every occurrence
    * in a drop doc with a larger id is deleted token-wise. A drop doc
    * whose every gram the history already owns scrubs to "". Read-only.
    */
  def scrubVsDrop(newDocs: DataFrame, storeDir: String, minDf: Int = 2,
                  idCol: String = "doc_id", textCol: String = "text",
                  eager: Boolean = true): DataFrame = {
    val s = newDocs.sparkSession
    val k = storedK(s, storeDir)
    val d = newDocs.select(col(idCol).as("doc_id"),
      TextOps.words(col(textCol)).as("ws"))
    val pos0 = posRows(newDocs, k, idCol, textCol)
    val pos = if (eager) Dedup.materialize(pos0) else pos0
    val dropStats = pos.groupBy(col("gram_key"))
      .agg(countDistinct(col("doc_id")).as("df_c"),
        min(col("doc_id")).as("min_doc"))
    val keepers = dropStats
      .join(serveStats(s, storeDir).select(col("gram_key"),
          col("gram_df").as("stored_df"), col("keeper").as("stored_keeper")),
        Seq("gram_key"), "left")
      .filter(col("df_c") + coalesce(col("stored_df"), lit(0L)) >= minDf)
      .select(col("gram_key"),
        least(col("min_doc"),
          coalesce(col("stored_keeper"), col("min_doc"))).as("keeper"))
    scrubTail(d, pos, keepers, k, eager)
  }

  // Takedown (q152's gate: the serve re-sums df and re-mins keepers over
  // the surviving drops, so a gram flagged only because of the removed
  // drop stops being a span and a stolen keeper falls back exactly) and
  // compaction are the inherited DropLedger lifecycle.
}
