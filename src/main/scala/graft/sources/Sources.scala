package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources and sinks: the engine's edges, replacing the reference's
  * NFS-path plumbing (recursive dir scan `utils/MiscUtils.java:15-38`,
  * FileMover/merge sinks `utils/FileMover.java` + `utils/BAMMerger.java`,
  * SURVEY.md S1/S5/O14-O16).
  */
object Sources {

  /** S1 analog: recursive multi-dataset scan. Each immediate subdirectory
    * of `root` is one dataset (the reference's multi-tenancy convention,
    * `sparkcaller/README.md:62-66`); the subdir name becomes an ordinary
    * `dataset_id` column so downstream per-dataset gathers are plain
    * `groupBy($"dataset_id")` — no path juggling.
    *
    * `recursiveFileLookup` + `pathGlobFilter` replace the hand-rolled
    * recursion/extension filter; `input_file_name()` recovers lineage.
    *
    * `dataset_id` is the FIRST path component under `root` — NOT the
    * file's immediate parent: recursive lookup is exactly what lets a
    * dataset nest deeper (root/ds1/year=2020/f.parquet), and the parent
    * dir there is 'year=2020', which would shred one dataset into bogus
    * groups. Falls back to the parent-dir name only when the root prefix
    * can't be located in the file URI (exotic scheme/encoding).
    */
  def scanDatasets(spark: SparkSession, root: String,
                   format: String = "parquet", glob: String = "*.parquet"): DataFrame = {
    val underRoot =
      java.util.regex.Pattern.quote(root.stripSuffix("/")) + "/([^/]+)/"
    spark.read
      .format(format)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(root)
      .withColumn("dataset_id",
        coalesce(
          nullif(regexp_extract(input_file_name(), underRoot, 1), lit("")),
          regexp_extract(input_file_name(), s"^.*/([^/]+)/[^/]+$$", 1)))
  }

  /** CSV source with schema inference off by default (schema-on-read is a
    * full extra pass at 100 TB — callers should pass explicit DDL; without
    * one, columns come back as strings, they do NOT trigger an inference
    * scan).
    */
  def csv(spark: SparkSession, path: String, schemaDdl: Option[String] = None): DataFrame = {
    // loud, not silent: downstream arithmetic on all-string columns is the
    // failure mode this warning exists for (callers migrating from
    // inferSchema-on readers)
    if (schemaDdl.isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "graft.Sources.csv: no schema DDL supplied — all columns read as " +
          "strings (schema inference is intentionally OFF: it costs a full " +
          "extra pass at scale). Pass schemaDdl for typed columns.")
    val r = spark.read.option("header", "true")
    schemaDdl.fold(r)(d => r.schema(d)).csv(path)
  }

  /** JSON-lines source (explicit schema strongly preferred, same reason). */
  def jsonLines(spark: SparkSession, path: String, schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read
    schemaDdl.fold(r)(d => r.schema(d)).json(path)
  }

  /** ORC source — same columnar pushdown/pruning properties as parquet
    * (footer stats, predicate pushdown, column pruning all apply).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S5/O14 analog sink: partitioned, sorted parquet write. Spark's commit
    * protocol replaces the reference's manual rename-into-place; the
    * "merge of sorted runs" becomes sortWithinPartitions + one writer per
    * partition directory — no driver-side k-way merge.
    */
  def writePartitioned(df: DataFrame, outDir: String, partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil, format: String = "parquet"): Unit = {
    // sort by partitionCols FIRST: the file writer requires its output
    // ordered by the partition columns, and if the child ordering doesn't
    // already satisfy that, Spark inserts its OWN sort by partitionCols
    // only — silently destroying the per-file sortCols order this sink
    // promises. A (partitionCols ++ sortCols) local sort satisfies the
    // writer's requirement, so no extra sort is planned and the data
    // order inside each file is exactly sortCols.
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(
        (partitionCols ++ sortCols.filterNot(partitionCols.contains)).map(col): _*)
    sorted.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(outDir)
  }

  /** Bucketed table sink: co-locates future equi-joins/aggregations on
    * `bucketCols` (O4 BAMIndexer's role — make downstream per-key access
    * cheap — done the warehouse way).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Morton (z-order) interleave of two 16-bit bucket values — the
    * classic magic-mask bit spread, pure integer expressions (codegen'd).
    */
  def mortonInterleave(a: Column, b: Column): Column = {
    def spread(x: Column): Column = {
      val v1 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
      val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
      (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-order clustered parquet write: lays rows out along a space-filling
    * curve over TWO numeric dimensions so parquet footer min/max stats
    * prune files/row-groups for range predicates on EITHER or BOTH columns
    * — the data-layout lever a single sort key can't give (a sort on `a`
    * leaves `b` scattered across every file). At 100 TB this is the
    * difference between scanning the table and scanning ~√(selectivity)
    * of it for 2-D slices (time × key, contig × position, …).
    *
    * Mechanics: each dim is linearly bucketed to 16 bits against its
    * observed min/max (one tiny agg; linear is right for roughly uniform
    * dims — pre-transform a skewed dim to ranks/quantiles first), bits are
    * Morton-interleaved, rows are range-partitioned and sorted by the
    * z-value, and `files` writers emit locality-tight files. The z column
    * is layout-only and dropped before write (row order is preserved
    * through the final projection).
    */
  def writeZOrdered(df: DataFrame, outDir: String, colA: String, colB: String,
                    files: Int): Unit = {
    val stats = df
      .agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
           min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .head()
    // an all-null/empty dim would otherwise unbox to 0.0 and silently
    // degenerate to a single z-bucket — no pruning, no signal
    require((0 until 4).forall(!stats.isNullAt(_)),
      s"writeZOrdered: $colA/$colB must have non-null min/max (empty or all-null column?)")
    writeZOrdered(df, outDir, colA, colB, files,
      (stats.getDouble(0), stats.getDouble(1)), (stats.getDouble(2), stats.getDouble(3)))
  }

  /** [[writeZOrdered]] for SKEWED dimensions: buckets each dim by its
    * approximate QUANTILES (one approxQuantile pass, driver-sized
    * boundary array, binary-searched per row by `ml.feature.Bucketizer`)
    * instead of linearly. Linear bucketing wastes almost the whole 16-bit
    * range on a heavy-tailed dim — a zipfian column with 90% of rows
    * under 100 and a tail to 10⁶ gets ~7 distinct linear buckets for the
    * dense region, so files can't separate values where the data actually
    * lives; quantile buckets are equal-occupancy by construction, making
    * per-file ranges tight exactly where the rows are (LayoutSpec shows a
    * dense-region box touching far fewer files than the linear layout).
    */
  def writeZOrderedByQuantile(df: DataFrame, outDir: String, colA: String,
                              colB: String, files: Int,
                              buckets: Int = 4096): Unit = {
    require(buckets > 1 && buckets <= 65536, "buckets must be in (1, 65536]")
    import org.apache.spark.ml.feature.Bucketizer
    val probs = (0 to buckets).map(_.toDouble / buckets).toArray
    // ONE quantile pass for both dims; sketch error must out-resolve the
    // requested bucket spacing or adjacent boundaries collapse silently
    val all = df.stat.approxQuantile(
      Array(colA, colB), probs, 1.0 / (2.0 * buckets))
    def splitsOf(qs: Array[Double]): Array[Double] = {
      val inner = qs.slice(1, qs.length - 1).distinct.sorted
      Array(Double.NegativeInfinity) ++ inner ++ Array(Double.PositiveInfinity)
    }
    val (splitsA, splitsB) = (splitsOf(all(0)), splitsOf(all(1)))
    val withDoubles = df
      .withColumn("__da", col(colA).cast("double"))
      .withColumn("__db", col(colB).cast("double"))
    // a constant/all-null/empty dim yields no inner boundaries — it
    // carries no locality, so it degrades to a single bucket instead of
    // tripping Bucketizer's >=3-splits validation
    def bucketCol(in: String, out: String, splits: Array[Double])(d: DataFrame) =
      if (splits.length < 3) d.withColumn(out, lit(0.0))
      else new Bucketizer().setInputCol(in).setOutputCol(out)
        .setSplits(splits).transform(d)
    val bucketed = bucketCol("__db", "__bb", splitsB)(
      bucketCol("__da", "__ba", splitsA)(withDoubles))
    // bucket indices must be RESCALED onto the full 16-bit Morton grid:
    // low-cardinality dims collapse to few distinct splits, and un-scaled
    // indices would occupy only the lowest z-tiles (one tile = no
    // within-dim locality — exactly the failure quantiles exist to fix)
    def gridded(c: org.apache.spark.sql.Column, nBuckets: Int) =
      if (nBuckets <= 1) lit(0L)
      else floor(c * 65535.0 / (nBuckets - 1)).cast("long")
    writeByZ(
      bucketed.withColumn("__z", mortonInterleave(
        gridded(col("__ba"), splitsA.length - 1),
        gridded(col("__bb"), splitsB.length - 1))),
      outDir, files, Seq("__z", "__da", "__db", "__ba", "__bb"))
  }

  /** Shared layout-write tail: range-partition + sort by the z column,
    * drop the scratch columns, overwrite parquet.
    */
  private def writeByZ(df: DataFrame, outDir: String, files: Int,
                       scratch: Seq[String]): Unit =
    df.repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop(scratch: _*)
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** [[writeZOrdered]] with caller-supplied dim bounds — skips the stats
    * pass (one full scan saved; at 100 TB pass the bounds you already
    * know, e.g. from table stats or the natural domain).
    */
  def writeZOrdered(df: DataFrame, outDir: String, colA: String, colB: String,
                    files: Int, aRange: (Double, Double), bRange: (Double, Double)): Unit = {
    def bucket(c: String, r: (Double, Double)): Column =
      if (r._2 <= r._1) lit(0L)
      else least(greatest(
        floor((col(c).cast("double") - r._1) / (r._2 - r._1) * 65535), lit(0L)), lit(65535L))
    writeByZ(
      df.withColumn("__z",
        mortonInterleave(bucket(colA, aRange), bucket(colB, bRange))),
      outDir, files, Seq("__z"))
  }
}
