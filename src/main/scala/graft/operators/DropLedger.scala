package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE implementation of the drop-ledgered store lifecycle — the
  * scaffold `LmStore` (sum-merge counts), `GramStore` (min-merge
  * ownership), `SpanStore` (sum+min gram-df), and `ManifestStore`
  * (xor/sum certificate partials) share. Each store keeps what makes it
  * itself — the partials computation, the merge-discipline serve, and
  * its validators — while the lifecycle that must behave IDENTICALLY
  * everywhere lives here once, loudly:
  *
  *  - one parquet table of per-drop partial rows keyed by `drop_id`;
  *    bootstrap files at the table root, every appended drop in its own
  *    atomically-renamed `drop-<id>/` subdirectory
  *    ([[StoreSwap.commitDropDir]] — a crash leaves the drop fully
  *    absent or fully present, never half-visible to the ledger),
  *    takedown/compact rewrites flat; `recursiveFileLookup` reads all
  *    three layouts.
  *  - `exists` routes through [[StoreSwap.requireNotCrashed]]: live
  *    missing with a swap marker present is a loud mid-recovery error,
  *    never a quiet false that an exists-gated bootstrap would
  *    overwrite.
  *  - staged build/append: partials land in a staging dir NOW, the
  *    commit thunk publishes LATER — callers sequence it after their
  *    own output write (the store-mutation-commits-LAST discipline).
  *  - takedown by drop-row deletion (exact under every merge the family
  *    uses: sums/mins/xors re-aggregate to the never-ingested state)
  *    with the crash-safe `_takedown-old` swap; double-removal is loud.
  *
  * This was four copy-pasted lifecycles before round 10 consolidated
  * them (the same move StoreSwap made for the swap discipline in r9):
  * a fix like the atomic-append commit now lands in ONE place.
  */
trait DropLedger {

  /** The partial table's directory name under the store dir. */
  protected def tableName: String

  /** Human name for error messages ("LM store", "span store", ...). */
  protected def kind: String

  def tablePath(storeDir: String): String = s"$storeDir/$tableName"

  def exists(s: SparkSession, storeDir: String): Boolean = {
    StoreSwap.requireNotCrashed(s, storeDir, tablePath(storeDir))
    val p = new org.apache.hadoop.fs.Path(tablePath(storeDir))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  def load(s: SparkSession, storeDir: String): DataFrame =
    s.read.option("recursiveFileLookup", "true").parquet(tablePath(storeDir))

  /** Sidecar naming the drop ids whose rows live FLAT at the table root
    * (the bootstrap cohort and post-takedown/compact rewrites): one id
    * per line, written atomically with the data it describes (inside
    * the staging dir the commit renames / the rewrite swaps in).
    * Appended drops are named by their `drop-<id>/` directory instead,
    * so [[drops]] never reads the partials table.
    */
  private val DropsFile = "_drops"

  /** Drop ids already ingested (driver-sized: one string per drop).
    * METADATA-SCALE (r16 "what's missing #3"): the `drop-<id>/`
    * directory listing plus the flat cohort's [[DropsFile]] sidecar —
    * [[requireNewDrop]] sits on every append across all 13 ledgered
    * families, and the previous implementation paid a
    * linear-in-history drop_id scan of the partials table per append.
    * The distinct scan survives only as the fallback for pre-sidecar
    * flat layouts (stores written before the sidecar existed).
    */
  def drops(s: SparkSession, storeDir: String): Set[String] =
    if (!exists(s, storeDir)) Set.empty
    else {
      val fs = fileSystem(s, storeDir)
      val root = new org.apache.hadoop.fs.Path(tablePath(storeDir))
      val entries = fs.listStatus(root)
      val subIds = entries.filter(e => e.isDirectory &&
          e.getPath.getName.startsWith("drop-"))
        .map(_.getPath.getName.stripPrefix("drop-")).toSet
      val sidecar = new org.apache.hadoop.fs.Path(root, DropsFile)
      val flat: Set[String] =
        if (fs.exists(sidecar)) {
          val in = fs.open(sidecar)
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .map(_.trim).filter(_.nonEmpty).toSet
          finally in.close()
        } else
          // legacy pre-sidecar flat layout — the one remaining scan;
          // any rewrite or rebuild with current code retires it
          load(s, storeDir).select(col("drop_id")).distinct()
            .collect().map(_.getString(0)).toSet
      flat ++ subIds
    }

  /** Write [[DropsFile]] into a flat staging dir. The rewrite paths
    * pass the surviving id set explicitly (carried forward from the
    * pre-rewrite ledger — an enrolled drop whose every row was
    * deduplicated or taken down stays enrolled, the FpStore tombstone
    * semantics, so a crash-replayed epoch is still skipped after a
    * compaction); the bootstrap derives it from the staged partials
    * with one column-pruned scan (build time, never the append path).
    */
  protected def writeDropsSidecar(s: SparkSession, stagingDir: String,
                                  ids: Set[String]): Unit = {
    val fs = fileSystem(s, stagingDir)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(stagingDir, DropsFile), true)
    try out.write((ids.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def stagedDropIds(s: SparkSession, stagingDir: String): Set[String] =
    if (!stagingHasData(s, stagingDir)) Set.empty
    else s.read.parquet(stagingDir).select(col("drop_id")).distinct()
      .collect().map(_.getString(0)).toSet

  /** A staged write of a 0-partition frame leaves only _SUCCESS — a
    * read-back would die on schema inference, so sidecar derivation
    * checks for data files first.
    */
  protected def stagingHasData(s: SparkSession, stagingDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(stagingDir)
    fileSystem(s, stagingDir).listStatus(p).exists { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Hook for stores that keep their own sidecar metadata next to the
    * partials (HashStore's `_shape` recipe marker): called on every
    * FLAT rewrite's staging dir — takedown, purge, compaction — after
    * the data lands and before the swap, while the pre-rewrite store is
    * still live to read. Default: nothing.
    */
  protected def rewriteSidecar(s: SparkSession, storeDir: String,
                               stagingDir: String): Unit = ()

  protected def requireDropId(dropId: String): Unit =
    require(dropId.matches("[A-Za-z0-9._-]+"),
      s"drop_id must be a plain token, got '$dropId'")

  protected def requireStore(s: SparkSession, storeDir: String): Unit =
    require(exists(s, storeDir),
      s"no $kind under $storeDir — run build first")

  protected def requireNewDrop(s: SparkSession, storeDir: String,
                               dropId: String): Unit =
    require(!drops(s, storeDir).contains(dropId),
      s"drop '$dropId' is already ingested in $kind $storeDir — " +
        "appending it again would corrupt the merged serve")

  /** A staged-but-unpublished write: where the partials landed, and the
    * thunk that makes them live. Stores that serve a preview of the
    * post-commit state (LmStore's `serveModelWith`) read `stagingDir`
    * back — materialized, never recomputed.
    */
  protected final case class StagedWrite(stagingDir: String, commit: () => Unit)

  /** Stage a bootstrap: write `partials` to staging now, publish on the
    * thunk (delete-live + single whole-dir rename).
    * `coalesceTo` — stores with tiny partials pin them to one file.
    */
  protected def stagePartialsBuild(partials: DataFrame, storeDir: String,
                                   coalesceTo: Option[Int] = None): StagedWrite = {
    val s = partials.sparkSession
    val staging = stagingPath(storeDir)
    coalesceTo.fold(partials)(partials.coalesce)
      .write.mode("overwrite").parquet(staging)
    writeDropsSidecar(s, staging, stagedDropIds(s, staging))
    StagedWrite(staging, () => {
      val fs = fileSystem(s, storeDir)
      val live = new org.apache.hadoop.fs.Path(tablePath(storeDir))
      fs.delete(live, true)
      require(fs.rename(new org.apache.hadoop.fs.Path(staging), live),
        s"could not commit staged $kind $staging -> $live")
    })
  }

  /** Stage an append: partials to staging now; the thunk commits with
    * ONE rename into `drop-<id>/` ([[StoreSwap.commitDropDir]]).
    * Callers run their refusal checks (stored id, config spec) BEFORE
    * computing partials.
    */
  protected def stagePartialsAppend(partials: DataFrame, storeDir: String,
                                    dropId: String,
                                    coalesceTo: Option[Int] = None): StagedWrite = {
    val s = partials.sparkSession
    val staging = stagingPath(storeDir)
    coalesceTo.fold(partials)(partials.coalesce)
      .write.mode("overwrite").parquet(staging)
    StagedWrite(staging,
      () => StoreSwap.commitDropDir(s, tablePath(storeDir), staging, dropId))
  }

  /** Takedown: delete one drop's partial rows — exact under the family's
    * merges — via the crash-safe `_takedown-old` swap. Loud on an
    * unknown drop (a silent no-op takedown is a compliance bug).
    */
  def removeDrop(s: SparkSession, storeDir: String, dropId: String): Unit = {
    requireStore(s, storeDir)
    require(drops(s, storeDir).contains(dropId),
      s"drop '$dropId' is not in $kind $storeDir — nothing to remove")
    val survivors = drops(s, storeDir) - dropId
    val staging = stagingPath(storeDir)
    load(s, storeDir).filter(col("drop_id") =!= dropId)
      .write.mode("overwrite").parquet(staging)
    writeDropsSidecar(s, staging, survivors)
    rewriteSidecar(s, storeDir, staging)
    StoreSwap.swapIn(s, storeDir, tablePath(storeDir), staging, "_takedown-old")
  }

  /** Intra-drop PURGE for merge families whose partials cannot subtract
    * (max-merge: [[graft.text.SketchStore]]): replace ONE drop's partial
    * rows with freshly-computed partials — rebuilt by the caller from
    * the drop's remaining raw rows — in a single crash-safe swap, so the
    * serve afterwards ≡ a store whose drop never contained the purged
    * rows. The sum/min/xor families don't need this (row deletion or
    * subtraction is already exact); any FUTURE max-merge family inherits
    * the same recipe: the ledger keeps raw-drop provenance out of the
    * store, so doc-granular takedown = re-derive that drop's partials
    * from its surviving raw rows and swap them in here.
    */
  def replaceDropRows(s: SparkSession, storeDir: String, dropId: String,
                      freshPartials: DataFrame): Unit = {
    requireStore(s, storeDir)
    require(drops(s, storeDir).contains(dropId),
      s"drop '$dropId' is not in $kind $storeDir — nothing to purge")
    val survivors = drops(s, storeDir)
    val staging = stagingPath(storeDir)
    load(s, storeDir).filter(col("drop_id") =!= dropId)
      .unionByName(freshPartials)
      .write.mode("overwrite").parquet(staging)
    writeDropsSidecar(s, staging, survivors)
    rewriteSidecar(s, storeDir, staging)
    StoreSwap.swapIn(s, storeDir, tablePath(storeDir), staging, "_purge-old")
  }

  /** Maintenance: rewrite the table into `targetFiles` files, contents
    * identical (crash-safe `_compact-old` swap).
    */
  def compact(s: SparkSession, storeDir: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    requireStore(s, storeDir)
    val survivors = drops(s, storeDir)
    val staging = stagingPath(storeDir)
    load(s, storeDir).coalesce(targetFiles)
      .write.mode("overwrite").parquet(staging)
    writeDropsSidecar(s, staging, survivors)
    rewriteSidecar(s, storeDir, staging)
    StoreSwap.swapIn(s, storeDir, tablePath(storeDir), staging, "_compact-old")
  }

  protected def stagingPath(storeDir: String): String =
    s"$storeDir/_staging-${java.util.UUID.randomUUID().toString.take(8)}"

  private def fileSystem(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
}
