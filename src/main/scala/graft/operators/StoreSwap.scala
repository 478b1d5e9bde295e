package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE implementation of the store family's crash-safe directory
  * swap (previously copy-pasted per store): the replacement lands in a
  * staging dir, the live dir moves aside under a marker name, staging
  * renames in, the marker is deleted. A crash leaves either the old
  * store live, or (inside the two-rename window) the old store intact
  * under the marker with the live path ABSENT.
  *
  * That absent-live crash state is the dangerous one: an `exists()`-gated
  * caller (the CLI bootstraps a store when it sees none) would silently
  * re-initialize a fresh store and abandon the entire history under the
  * marker — a takedown crash must never cost the ledger. So every
  * store's `exists()` routes through [[requireNotCrashed]]: live missing
  * WITH a marker present is an error naming the recovery (`hadoop fs
  * -mv <marker> <live>` to roll back, or delete the marker after
  * confirming the staged copy was lost), never a quiet `false`.
  */
object StoreSwap {

  val Markers: Seq[String] = Seq("_takedown-old", "_compact-old", "_purge-old")

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Swap `staging` into `live` (both directories), crash-safely, moving
    * the old copy aside under `storeDir/<marker>` during the window.
    */
  def swapIn(s: SparkSession, storeDir: String, live: String,
             staging: String, marker: String): Unit = {
    require(Markers.contains(marker), s"unknown swap marker '$marker'")
    val f = fs(s, storeDir)
    val livePath = new Path(live)
    val old = new Path(s"$storeDir/$marker")
    f.delete(old, true)
    require(f.rename(livePath, old), s"could not move live store aside: $live")
    require(f.rename(new Path(staging), livePath),
      s"could not swap staged copy in: $staging -> $live")
    f.delete(old, true)
    ()
  }

  /** Commit one drop's staged partials into the live table with a SINGLE
    * rename: `staging` → `live/drop-<dropId>` (readers load the table
    * with `recursiveFileLookup`). The single rename is what makes the
    * append atomic: the old per-file loop left a crash window where SOME
    * part files of a drop were live — the drop_id was then visible to
    * `drops()`, so the retry path skipped the re-append and the store
    * permanently under-counted, with no marker and no error. With one
    * rename, a crash leaves the drop either fully absent (retry
    * re-appends) or fully present (retry refused by the drops() ledger).
    */
  def commitDropDir(s: SparkSession, live: String, staging: String,
                    dropId: String): Unit = {
    val f = fs(s, live)
    val dest = new Path(live, s"drop-$dropId")
    require(!f.exists(dest),
      s"drop '$dropId' already has a committed directory under $live — " +
        "a concurrent or retried append must be refused, not overlaid")
    require(f.rename(new Path(staging), dest),
      s"could not commit staged drop $staging -> $dest")
  }

  /** Loud crash detection for `exists()` paths: if the live dir is
    * missing but a swap marker survives, the store is mid-recovery, not
    * absent — bootstrapping over it would silently discard the history.
    */
  def requireNotCrashed(s: SparkSession, storeDir: String, live: String): Unit = {
    val f = fs(s, storeDir)
    if (!f.exists(new Path(live))) {
      Markers.foreach { m =>
        val p = new Path(s"$storeDir/$m")
        if (f.exists(p)) throw new IllegalStateException(
          s"store at $storeDir has no live data but a crashed swap left $p — " +
            s"recover by renaming it back to $live (the pre-swap contents), " +
            "or delete it only after confirming the swap's staged copy is lost")
      }
    }
  }
}
