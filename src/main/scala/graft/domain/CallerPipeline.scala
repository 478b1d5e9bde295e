package graft.domain

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Model._

/** The reference pipeline's stages as record-level, typed transforms —
  * the full SparkCaller preprocessing + discovery spine
  * (daas-apps `SparkCaller.java:125-141,291-294`) over `Dataset[Read]`:
  *
  *   sort → read-group overwrite → duplicate-mark → realign-flag (interval
  *   join) → BQSR (covariate agg, anti-join known sites, broadcast apply) →
  *   per-contig variant calling → per-dataset gather.
  *
  * Stage gating reproduces O18's semantics exactly: a stage runs iff its
  * `Properties` key is present, and the two paired stages require BOTH
  * keys (`SparkCaller.java:148,255`). All stages compose into ONE lazy
  * plan — the reference's per-stage collect() barriers
  * (`SparkCaller.java:98,111,154,172,260,310`) do not exist here.
  */
object CallerPipeline {

  // The reference's stage keys (sparkcaller/README.md:31-41).
  val SortSam = "SortSam"
  val AddOrReplaceReadGroups = "AddOrReplaceReadGroups"
  val MarkDuplicates = "MarkDuplicates"
  val RealignerTargetCreator = "RealignerTargetCreator"
  val IndelRealigner = "IndelRealigner"
  val BaseRecalibrator = "BaseRecalibrator"
  val PrintReads = "PrintReads"
  val HaplotypeCaller = "HaplotypeCaller"

  /** O1: coordinate sort in contig-dictionary order. Range partitioning on
    * (rank, pos) is Spark's distributed sort; the broadcast dictionary
    * replaces the driver-side header scan (S4).
    */
  def sortReads(reads: DataFrame, dict: DataFrame): DataFrame =
    reads
      .join(broadcast(dict.select(col("contig"), col("contig_rank"))), Seq("contig"), "left")
      .orderBy(col("contig_rank").asc_nulls_last, col("pos").asc, col("qname").asc)
      .drop("contig_rank")

  /** O2: overwrite every record's read group with constants. */
  def addOrReplaceRG(reads: DataFrame, rg: ReadGroup): DataFrame =
    reads.withColumn("read_group",
      struct(lit(rg.id).as("id"), lit(rg.lib).as("lib"), lit(rg.pl).as("pl"),
        lit(rg.pu).as("pu"), lit(rg.sm).as("sm")))

  /** O3: flag (not drop) duplicates — same (library, contig, pos) group,
    * keep the highest quality-sum read, deterministic tie-break on qname
    * (SURVEY §7.3.1: the window ordering MUST be total).
    */
  def markDuplicates(reads: DataFrame): DataFrame = {
    val qualSum = aggregate(col("qual"), lit(0L), (a, x) => a + x)
    val w = Window
      .partitionBy(col("dataset_id"), col("read_group.lib"), col("contig"), col("pos"))
      .orderBy(qualSum.desc, col("qname").asc)
    reads.withColumn("flag",
      when(row_number().over(w) > 1, col("flag").bitwiseOR(lit(DuplicateFlag)))
        .otherwise(col("flag")))
  }

  /** O7: interval join — flag reads overlapping a realignment target.
    * Broadcast non-equi join (targets are dimension-sized); the `unmapped`
    * pseudo-contig is skipped exactly like `BaseGATKProgram.setInterval`
    * skips `-L unmapped` (`BaseGATKProgram.java:62-67`).
    */
  def realignFlag(reads: DataFrame, targets: Dataset[Interval]): DataFrame = {
    val t = broadcast(targets.toDF()
      .select(col("contig").as("t_contig"), col("start"), col("stop"),
        col("dataset_id").as("t_ds")))
    reads
      .join(t,
        col("contig") =!= lit(Unmapped) &&
          col("contig") === col("t_contig") && col("dataset_id") === col("t_ds") &&
          col("pos") >= col("start") && col("pos") <= col("stop"),
        "left")
      .groupBy(reads.columns.map(col): _*)
      .agg(max(when(col("t_contig").isNotNull, 1).otherwise(0)).as("realigned"))
  }

  /** O8: covariate aggregation for BQSR — per (read group, reported
    * quality) observation/mismatch-proxy counts, EXCLUDING known sites via
    * broadcast anti-join (`-knownSites`).
    */
  def recalTable(reads: DataFrame, knownSites: Dataset[KnownSite]): DataFrame =
    reads
      .join(broadcast(knownSites.toDF().select(col("contig"), col("pos"))),
        Seq("contig", "pos"), "left_anti")
      .select(col("read_group.id").as("rg_id"), explode(col("qual")).as("reported_q"))
      .groupBy(col("rg_id"), col("reported_q"))
      .agg(count(lit(1)).as("n_observations"))

  /** O9: BQSR apply — broadcast the recal table back and rewrite each base
    * quality via the (here: shift-by-observation-count-parity, a computable
    * stand-in for the empirical-quality formula) lookup.
    */
  def applyRecal(reads: DataFrame, recal: DataFrame): DataFrame = {
    val lookup = broadcast(recal
      .groupBy(col("rg_id"))
      .agg(sum(col("n_observations")).as("rg_obs")))
    reads
      .join(lookup, col("read_group.id") === col("rg_id"), "left")
      .withColumn("qual",
        transform(col("qual"), q => q + (coalesce(col("rg_obs"), lit(0L)) % 2).cast("int")))
      .drop("rg_id", "rg_obs")
  }

  /** O13: per-(dataset, contig) variant calling analog through the typed
    * flatMapGroups slot: emit a Variant wherever ≥ minDepth non-duplicate
    * reads start at the same position (a computable pileup stand-in for
    * the opaque HaplotypeCaller; the SLOT is what the engine provides).
    * Groups are (dataset, contig)-bounded — not whole-dataset — per
    * SURVEY §7.3.4's state-bounding requirement.
    */
  def callVariants(reads: DataFrame, minDepth: Int)(implicit s: SparkSession): Dataset[Variant] = {
    import s.implicits._
    reads
      .filter(col("contig") =!= lit(Unmapped) &&
        (col("flag").bitwiseAND(lit(DuplicateFlag))) === 0)
      .select(col("dataset_id"), col("contig"), col("pos"), col("qual"))
      .as[(String, String, Long, Seq[Int])]
      .groupByKey { case (ds, contig, _, _) => (ds, contig) }
      .flatMapGroups { (key: (String, String), it: Iterator[(String, String, Long, Seq[Int])]) =>
        val (ds, contig) = key
        // pileup by position with O(positions) state, bounded by contig
        val depth = scala.collection.mutable.LinkedHashMap.empty[Long, (Int, Long)]
        it.foreach { case (_, _, pos, qual) =>
          val (n, qsum) = depth.getOrElse(pos, (0, 0L))
          depth(pos) = (n + 1, qsum + qual.sum)
        }
        depth.iterator.collect { case (pos, (n, qsum)) if n >= minDepth =>
          Variant(contig, pos, "N", "V", qsum.toDouble / n, n, ds)
        }
      }
  }

  /** O14/O15/O16: per-dataset gather of called variants, sorted merge. */
  def gatherVariants(variants: Dataset[Variant]): DataFrame =
    variants.toDF()
      .groupBy(col("dataset_id"))
      .agg(count(lit(1)).as("n_variants"), sum(col("n_reads")).as("total_depth"))

  /** O18/O19: the config-gated composed pipeline — one lazy plan.
    * Paired stages require BOTH keys, mirroring `SparkCaller.java:148,255`;
    * disabled stages are identity (elided at construction).
    */
  def preprocess(
      reads: DataFrame, dict: DataFrame, targets: Dataset[Interval],
      knownSites: Dataset[KnownSite], config: Map[String, String]): DataFrame = {
    def enabled(keys: String*) = keys.forall(config.contains)
    var df = reads
    if (enabled(SortSam)) df = sortReads(df, dict)
    if (enabled(AddOrReplaceReadGroups))
      df = addOrReplaceRG(df, ReadGroup(
        config.getOrElse(AddOrReplaceReadGroups, "RG1"), "lib1", "illumina", "unit1", "s1"))
    if (enabled(MarkDuplicates)) df = markDuplicates(df)
    if (enabled(RealignerTargetCreator, IndelRealigner)) df = realignFlag(df, targets)
    if (enabled(BaseRecalibrator, PrintReads)) df = applyRecal(df, recalTable(df, knownSites))
    df
  }

  def discover(preprocessed: DataFrame, config: Map[String, String], minDepth: Int = 2)(
      implicit s: SparkSession): Option[Dataset[Variant]] =
    if (config.contains(HaplotypeCaller)) Some(callVariants(preprocessed, minDepth)) else None
}
