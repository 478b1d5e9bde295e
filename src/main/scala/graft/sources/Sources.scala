package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
    */
  def scanDatasets(spark: SparkSession, root: String,
                   format: String = "parquet", glob: String = "*.parquet"): DataFrame =
    spark.read
      .format(format)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(root)
      .withColumn("dataset_id",
        regexp_extract(input_file_name(), s"^.*/([^/]+)/[^/]+$$", 1))

  /** CSV source with schema inference off by default (schema-on-read is a
    * full extra pass at 100 TB — callers should pass explicit DDL).
    */
  def csv(spark: SparkSession, path: String, schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schemaDdl.fold(r.option("inferSchema", "true"))(d => r.schema(d)).csv(path)
  }

  /** JSON-lines source (explicit schema strongly preferred, same reason). */
  def jsonLines(spark: SparkSession, path: String, schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read
    schemaDdl.fold(r)(d => r.schema(d)).json(path)
  }

  /** S5/O14 analog sink: partitioned, sorted parquet write. Spark's commit
    * protocol replaces the reference's manual rename-into-place; the
    * "merge of sorted runs" becomes sortWithinPartitions + one writer per
    * partition directory — no driver-side k-way merge.
    */
  def writePartitioned(df: DataFrame, outDir: String, partitionCols: Seq[String],
                       sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    sorted.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
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
}
