package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, MERGEABLE manifest store: each corpus drop contributes its
  * [[Audit.manifest]] rows (per md5-shard: exact count + bit_xor + mod-sum
  * row fingerprints), and the whole-corpus reproducibility certificate is
  * served by merging the partials — count and mod-sum ADD, and xor of
  * per-drop xors IS the xor over the union (drops partition the corpus,
  * and xor is associative/commutative), so the served manifest is
  * bit-identical to q146 run over the union of every stored drop.
  *
  * Why a store for something q146 computes in one pass: the certificate
  * of a GROWING corpus. A daily pipeline re-certifying 100 TB would
  * rescan everything for an 8-row table; with per-drop partials the
  * daily cost is the new drop's scan, and the certificate updates by
  * re-aggregating drops×shards TINY rows. Takedown inherits the family's
  * exactness — deleting a drop's partials re-merges to exactly the
  * manifest of the remaining corpus (xor is self-inverse, sums subtract
  * by omission; q155's gate) — and the per-drop layout buys an audit the
  * corpus-level manifest cannot: [[compare]] localizes a divergence
  * between two replicas to the DROP (and shard) that differs, instead of
  * just "shard 5 differs somewhere in 100 TB".
  *
  * Storage: one parquet table `manifests` (drop_id, spec, shard, n_rows,
  * xor_fp, sum_fp) — `shards` rows per drop, so the store is measured in
  * KILOBYTES regardless of corpus size. `spec` stamps the fingerprint
  * configuration (key, columns, shard count); drops with mismatched
  * specs would merge garbage, so append and serve validate it
  * single-valued and loud. Layout mirrors [[graft.text.LmStore]]:
  * bootstrap at the table root, appended drops in atomically-renamed
  * `drop-<id>/` subdirectories, rewrites flat.
  */
object ManifestStore extends DropLedger {

  protected def tableName: String = "manifests"
  protected def kind: String = "manifest store"

  def rowsPath(storeDir: String): String = tablePath(storeDir)

  private def specOf(key: String, cols: Seq[String], shards: Int): String =
    (key +: cols).mkString(",") + "#" + shards

  /** One drop's manifest partials, tagged with drop id + config spec. */
  def partials(df: DataFrame, key: String, cols: Seq[String],
               shards: Int, dropId: String): DataFrame = {
    requireDropId(dropId)
    Audit.manifest(df, key, cols, shards)
      .select(lit(dropId).as("drop_id"),
        lit(specOf(key, cols, shards)).as("spec"),
        col("shard"), col("n_rows"), col("xor_fp"), col("sum_fp"))
  }

  /** The store's fingerprint configuration — single-valued or loud. */
  def storedSpec(s: SparkSession, storeDir: String): String = {
    requireStore(s, storeDir)
    val specs = load(s, storeDir).select(col("spec")).distinct()
      .collect().map(_.getString(0))
    require(specs.nonEmpty,
      s"manifest store $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    require(specs.length == 1,
      s"manifest store $storeDir holds mixed specs ${specs.sorted.mkString("; ")} — corrupt")
    specs.head
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(df: DataFrame, storeDir: String, dropId: String, key: String,
            cols: Seq[String], shards: Int = 8): Unit =
    buildStaged(df, storeDir, dropId, key, cols, shards)()

  def buildStaged(df: DataFrame, storeDir: String, dropId: String,
                  key: String, cols: Seq[String],
                  shards: Int = 8): () => Unit =
    stagePartialsBuild(partials(df, key, cols, shards, dropId), storeDir,
      coalesceTo = Some(1)).commit

  /** Append a new drop's partials (staged; atomic single-rename commit).
    * Refuses a stored id (counts/sums would double) and a config spec
    * different from the store's (the merge would be meaningless).
    */
  def appendStaged(df: DataFrame, storeDir: String, dropId: String,
                   key: String, cols: Seq[String],
                   shards: Int = 8): () => Unit = {
    val s = df.sparkSession
    val spec = specOf(key, cols, shards)
    val stored = storedSpec(s, storeDir)
    require(spec == stored,
      s"manifest spec mismatch: store has '$stored', append uses '$spec'")
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(df, key, cols, shards, dropId), storeDir,
      dropId, coalesceTo = Some(1)).commit
  }

  def append(df: DataFrame, storeDir: String, dropId: String, key: String,
             cols: Seq[String], shards: Int = 8): Unit =
    appendStaged(df, storeDir, dropId, key, cols, shards)()

  /** The merged whole-corpus manifest: (shard, n_rows, xor_fp, sum_fp) —
    * bit-identical to [[Audit.manifest]] over the union of every stored
    * drop. One aggregation over drops×shards rows.
    */
  def serve(s: SparkSession, storeDir: String): DataFrame = {
    storedSpec(s, storeDir) // also loud on a missing/corrupt store
    load(s, storeDir).groupBy(col("shard"))
      .agg(sum(col("n_rows")).as("n_rows"),
        expr("bit_xor(xor_fp)").as("xor_fp"),
        sum(col("sum_fp")).as("sum_fp"))
  }

  /** Divergence audit between two replicas' manifest stores: rows where
    * the same (drop_id, shard) disagrees — or exists on one side only —
    * localizing a corrupted/diverged build to the DROP, not just the
    * shard. Empty result = certified identical (up to fingerprint
    * collision). One full-outer join over two kilobyte-sized tables.
    */
  def compare(s: SparkSession, dirA: String, dirB: String): DataFrame = {
    // Same spec guard as appendStaged: replicas fingerprinted under
    // different (key, cols, shards) produce a full table of meaningless
    // "divergence" rows — refuse loudly instead.
    val (sa, sb) = (storedSpec(s, dirA), storedSpec(s, dirB))
    require(sa == sb,
      s"manifest spec mismatch between replicas: '$dirA' has '$sa', " +
        s"'$dirB' has '$sb' — comparing them row-by-row is meaningless")
    val a = load(s, dirA).select(col("drop_id"), col("shard"),
      col("n_rows").as("a_rows"), col("xor_fp").as("a_xor"),
      col("sum_fp").as("a_sum"))
    val b = load(s, dirB).select(col("drop_id"), col("shard"),
      col("n_rows").as("b_rows"), col("xor_fp").as("b_xor"),
      col("sum_fp").as("b_sum"))
    a.join(b, Seq("drop_id", "shard"), "full_outer")
      .filter(
        !(col("a_rows") <=> col("b_rows")) ||
          !(col("a_xor") <=> col("b_xor")) ||
          !(col("a_sum") <=> col("b_sum")))
  }

  // Takedown (q155's gate: the re-merge IS the manifest of the remaining
  // corpus — xor is self-inverse, sums subtract by omission) and
  // compaction are the inherited DropLedger lifecycle.
}
