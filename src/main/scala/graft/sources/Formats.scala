package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record-level readers for the reference's domain text formats (SAM, VCF,
  * FASTQ — SURVEY.md §1.1b). The reference never parses these itself (it
  * shells out whole files to samtools/Picard/GATK); here each format is a
  * `spark.read.text` scan plus codegen'd column expressions — partitioned,
  * predicate-pushable, and schema'd, so downstream operators see ordinary
  * typed columns instead of opaque files.
  *
  * Scale: text scans split by line ranges; parsing is per-row expressions
  * (no UDFs except FASTQ's 4-line stitching, which is an RDD zip by
  * design — see readFastq).
  */
object Formats {

  /** SAM-like alignment text: skips `@` header lines, parses the 11
    * mandatory tab-separated fields + trailing `TAG:TYPE:VALUE` attributes
    * into a map (htsjdk's record model, re-expressed as columns).
    */
  def readSamLike(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), "\t")
    spark.read.text(path)
      .filter(!col("value").startsWith("@") && length(col("value")) > 0)
      .select(
        element_at(parts, 1).as("qname"),
        element_at(parts, 2).cast("int").as("flag"),
        element_at(parts, 3).as("contig"),
        element_at(parts, 4).cast("long").as("pos"),
        element_at(parts, 5).cast("int").as("mapq"),
        element_at(parts, 6).as("cigar"),
        element_at(parts, 7).as("rnext"),
        element_at(parts, 8).cast("long").as("pnext"),
        element_at(parts, 9).cast("int").as("tlen"),
        element_at(parts, 10).as("seq"),
        element_at(parts, 11).as("qual"),
        map_from_entries(
          transform(
            slice(parts, lit(12), greatest(size(parts) - lit(11), lit(0))),
            a => struct(
              substring_index(a, ":", 1).as("key"),
              substring_index(a, ":", -1).as("value")))).as("attrs"))
  }

  /** VCF-like variant text: skips `#` headers; CHROM POS ID REF ALT QUAL
    * FILTER INFO columns, ALT comma-split, INFO parsed to a map with
    * `str_to_map` (flag-style INFO keys get empty-string values).
    */
  def readVcfLike(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), "\t")
    spark.read.text(path)
      .filter(!col("value").startsWith("#") && length(col("value")) > 0)
      .select(
        element_at(parts, 1).as("chrom"),
        element_at(parts, 2).cast("long").as("pos"),
        element_at(parts, 3).as("id"),
        element_at(parts, 4).as("ref"),
        split(element_at(parts, 5), ",").as("alt"),
        element_at(parts, 6).cast("double").as("qual"),
        element_at(parts, 7).as("filter"),
        str_to_map(element_at(parts, 8), lit(";"), lit("=")).as("info"))
  }

  /** FASTQ: 4-line records (id / sequence / + / quality). Line-group
    * stitching needs a global line index — `zipWithIndex` (one pass, no
    * shuffle for the index itself; the groupBy shuffles only (id,seq,qual)
    * triples). Used for the aligner-input edge (O21's FASTQ chunking).
    */
  def readFastq(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd
      .zipWithIndex()
      .map { case (line, idx) => (idx / 4, (idx % 4, line)) }
      .groupByKey()
      .map { case (rec, lines) =>
        val m = lines.toMap
        // fail LOUDLY on malformed input: a truncated tail would otherwise
        // throw a bare NoSuchElementException, and — much worse — a single
        // stray/blank line shifts the global 4-line framing so every
        // subsequent record silently mixes fields of different reads. The
        // marker checks catch the shift at the first misframed record.
        if (m.size != 4)
          throw new IllegalArgumentException(
            s"FASTQ record $rec is truncated (${m.size}/4 lines) — input must be 4-line aligned")
        val header = m(0L)
        val plus = m(2L)
        if (!header.startsWith("@") || !plus.startsWith("+"))
          throw new IllegalArgumentException(
            s"FASTQ record $rec misframed (header='${header.take(30)}', sep='${plus.take(30)}') — " +
              "a stray or blank line has shifted the 4-line alignment")
        (rec, header.stripPrefix("@"), m(1L), m(3L))
      }
      .toDF("record_idx", "read_id", "seq", "qual")
      .drop("record_idx")
  }
}
