package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.domain.CallerPipeline._
import graft.domain.Model._

/** FIXTURES.md §1 domain fixtures + §3 invariants over the composed caller
  * pipeline: the reference's edge cases (unmapped-contig interval skip,
  * quality-tie dedup determinism, config-gated identity, half-pair stage
  * skip) exercised end-to-end on typed micro-Datasets.
  */
class GenomicsSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private val rg = ReadGroup("rg1", "libA", "illumina", "u1", "s1")

  private def read(q: String, contig: String, pos: Long, qual: Seq[Int],
                   ds: String = "ds1", flag: Int = 0) =
    Read(q, flag, contig, pos, 60, qual, rg, ds)

  private val dict = Seq(
    ContigInfo("chr1", 1000L, 0), ContigInfo("chr2", 500L, 1)).toDF()

  private val reads = Seq(
    read("r1", "chr1", 100L, Seq(30, 30)),
    read("r2", "chr1", 100L, Seq(20, 20)),      // duplicate of r1 (lower qual)
    read("r3", "chr1", 100L, Seq(30, 30)),      // quality TIE with r1 → qname break
    read("r4", "chr2", 50L, Seq(10, 10)),
    read("r5", Unmapped, 0L, Seq(5, 5)),        // unmapped: interval stages skip
    read("r6", "chr1", 300L, Seq(25, 25)),
    read("r7", "chr1", 300L, Seq(25, 25), flag = 0)).toDS().toDF()

  private val targets = Seq(
    Interval("chr1", 90L, 110L, "ds1"),
    Interval(Unmapped, 0L, 10L, "ds1")).toDS()

  private val known = Seq(KnownSite("chr1", 300L, "rs1")).toDS()

  private val fullConfig = Map(
    SortSam -> "", AddOrReplaceReadGroups -> "RGX", MarkDuplicates -> "",
    RealignerTargetCreator -> "", IndelRealigner -> "",
    BaseRecalibrator -> "", PrintReads -> "", HaplotypeCaller -> "")

  test("duplicate marking: best-by-quality survives, tie breaks on qname, order-independent") {
    def survivors(df: org.apache.spark.sql.DataFrame) =
      markDuplicates(df)
        .filter((col("flag").bitwiseAND(lit(DuplicateFlag))) === 0)
        .select("qname").as[String].collect().toSet
    val a = survivors(reads)
    val b = survivors(reads.orderBy(rand(11)))
    assert(a === b)
    assert(a.contains("r1") && !a.contains("r2") && !a.contains("r3")) // tie → min qname r1
  }

  test("interval join flags overlapping reads and skips the unmapped pseudo-contig") {
    val flagged = realignFlag(reads, targets)
      .select("qname", "realigned").as[(String, Int)].collect().toMap
    assert(flagged("r1") === 1 && flagged("r2") === 1)  // pos 100 ∈ [90,110]
    assert(flagged("r6") === 0)                          // pos 300 outside
    assert(flagged("r5") === 0)                          // unmapped skipped despite matching interval
  }

  test("recal table anti-joins known sites out") {
    val recal = recalTable(reads, known)
    // reads at chr1:300 (r6, r7) are known-site-excluded: 2 reads × 2 bases gone
    val totalObs = recal.agg(sum("n_observations")).as[Long].head()
    assert(totalObs === (reads.count() - 2) * 2)
  }

  test("empty config is identity; half-pair stage requirement skips the stage") {
    val out = preprocess(reads, dict, targets, known, Map.empty)
    assert(out.schema === reads.schema)
    assert(out.collect().toSet === reads.collect().toSet)
    // only one of the paired keys present → stage must NOT run (SparkCaller.java:255)
    val half = preprocess(reads, dict, targets, known, Map(RealignerTargetCreator -> ""))
    assert(!half.columns.contains("realigned"))
  }

  test("full pipeline end-to-end: one lazy plan, pileup variants called per contig") {
    val pre = preprocess(reads, dict, targets, known, fullConfig)
    val variants = discover(pre, fullConfig, minDepth = 2).get.collect()
    // chr1:100 has r1 surviving dedup only (r2, r3 dup-flagged) → depth 1, no call
    // chr1:300 has r6, r7 (different qnames, same pos, no dup group collision?
    //   same (lib, contig, pos) → r7 flagged dup → depth 1, no call
    // → the pipeline config with MarkDuplicates yields no ≥2 pileup
    assert(variants.isEmpty)
    // without dedup, chr1:100 piles 3 and chr1:300 piles 2
    val noDedup = fullConfig - MarkDuplicates
    val v2 = discover(preprocess(reads, dict, targets, known, noDedup), noDedup, 2).get
      .collect().map(v => (v.chrom, v.pos) -> v.n_reads).toMap
    assert(v2 === Map(("chr1", 100L) -> 3, ("chr1", 300L) -> 2))
    // unmapped reads never produce variants
    assert(!v2.keys.exists(_._1 == Unmapped))
  }

  test("gather rolls up per dataset") {
    val conf = fullConfig - MarkDuplicates
    val v = discover(preprocess(reads, dict, targets, known, conf), conf, 2).get
    val g = gatherVariants(v).as[(String, Long, Long)].collect()
      .map { case (d, n, t) => d -> ((n, t)) }.toMap
    assert(g("ds1") === ((2L, 5L)))
  }

  test("O1→O14: contig-DICTIONARY order (not lexicographic) survives sort + merge") {
    // a dictionary whose rank order CONFLICTS with string order — the BAM
    // header's sequence dictionary is authoritative (SortSam's coordinate
    // order), and 'chr10' < 'chr2' < 'chrM' lexicographically would
    // reorder all three
    val dictM = Seq(
      ContigInfo("chrM", 16000L, 0), ContigInfo("chr10", 1000L, 1),
      ContigInfo("chr2", 500L, 2)).toDF()
    val sliceA = Seq(
      read("a1", "chr2", 10L, Seq(1, 1)),
      read("a2", "chrM", 5L, Seq(1, 1))).toDS().toDF()
    val sliceB = Seq(
      read("b1", "chr10", 7L, Seq(1, 1)),
      read("b2", "chrM", 9L, Seq(1, 1))).toDS().toDF()
    val rank = dictM.select(col("contig"), col("contig_rank"))
    // O1 per scattered slice, then the O14 gather merge on the SAME
    // dictionary keys (rank re-joined: sortReads drops its helper column,
    // as a merged BAM drops nothing but needs the header dict again)
    val merged = graft.operators.Relational.sortedUnion(
      Seq(sortReads(sliceA, dictM), sortReads(sliceB, dictM))
        .map(_.join(broadcast(rank), Seq("contig"), "left")),
      col("contig_rank").asc_nulls_last, col("pos").asc, col("qname").asc)
    val got = merged.select("qname").as[String].collect().toSeq
    assert(got === Seq("a2", "b2", "b1", "a1"),
      "dictionary order is chrM(5), chrM(9), chr10(7), chr2(10); " +
        "lexicographic contig order would surface chr10 first")
  }
}
