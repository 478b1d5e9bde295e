package graft.domain

/** Typed domain schemas from FIXTURES.md §1 / SURVEY.md §1.3 — the record
  * types the reference's black-box stages operate on (SAM/VCF/interval/
  * recal formats via htsjdk, daas-apps `SparkCaller.java:7-10`), declared
  * as Spark-encodable case classes so the engine's operators are typed
  * where type safety helps (`Dataset[Read]`) and dynamic elsewhere.
  */
object Model {

  final case class ReadGroup(id: String, lib: String, pl: String, pu: String, sm: String)

  /** SAM/BAM alignment record (FIXTURES §1.1). `flag` bit 0x400 =
    * duplicate (set by the dedup stage, never by the source).
    */
  final case class Read(
      qname: String,
      flag: Int,
      contig: String,
      pos: Long,
      mapq: Int,
      qual: Seq[Int],
      read_group: ReadGroup,
      dataset_id: String)

  /** Sequence dictionary entry (FIXTURES §1.2) — drives range partitioning
    * and the dictionary-order coordinate sort.
    */
  final case class ContigInfo(contig: String, length: Long, contig_rank: Int)

  /** Realignment target interval (FIXTURES §1.3). */
  final case class Interval(contig: String, start: Long, stop: Long, dataset_id: String)

  /** Known variant site (FIXTURES §1.4) — anti-join side input. */
  final case class KnownSite(contig: String, pos: Long, id: String)

  /** Called variant (FIXTURES §1.6, simplified genotypes). */
  final case class Variant(
      chrom: String,
      pos: Long,
      ref: String,
      alt: String,
      qual: Double,
      n_reads: Int,
      dataset_id: String)

  val DuplicateFlag: Int = 0x400

  /** The reference's pseudo-contig for unaligned reads — interval-scoped
    * stages must skip it (`BaseGATKProgram.java:62-67`).
    */
  val Unmapped: String = "unmapped"
}
