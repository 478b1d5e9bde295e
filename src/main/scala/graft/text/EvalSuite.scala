package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A FIXED benchmark eval suite for contamination checks — the missing
  * half of q64/q127's realism: those derive the benchmark side from the
  * corpus itself (`doc_id % 19`), so the broadcast probe set GROWS with
  * the corpus, which a real fixed eval suite does not. This table is a
  * constant — 24 benchmark prompts checked into the engine — so the
  * broadcast side of every probe is genuinely constant in corpus size,
  * and the contamination operators can be gated against an oracle that
  * inlines the very same constant.
  *
  * The prompts are composed from the synthetic corpus's own 31-word
  * vocabulary so 3-gram overlap is non-trivial (a benchmark disjoint from
  * the corpus would gate nothing); one entry is deliberately shorter than
  * the 3-gram window to exercise the short-text fallback (it becomes its
  * own single shingle, matching TextOps.shingles' guard).
  *
  * [[table]] serves the suite the way production would consume it — as a
  * parquet TABLE read from its own fixture path (written once per
  * session to a temp dir, byte-identical every time), not an in-plan
  * literal — so the probe queries exercise the real scan + broadcast
  * shape.
  */
object EvalSuite {

  /** The fixed suite: (bench_id, text). NEVER derived from the corpus. */
  val Texts: Seq[(Long, String)] = Seq(
    1L -> "the customer query scans the order table",
    2L -> "key agg row scan slow fast table",
    3L -> "spark order data column join small",
    4L -> "fast merge batch part value stream",
    5L -> "big vector table fast batch window",
    6L -> "hash value table part a row",
    7L -> "the line sort table window group",
    8L -> "small fast slow filter value query",
    9L -> "batch window spark order data line",
    10L -> "scan query big table part agg",
    11L -> "group value sort column query stream",
    12L -> "a the key data filter merge",
    13L -> "slow scan window customer part order",
    14L -> "join column vector hash stream big",
    15L -> "value fast key table row merge",
    16L -> "customer line query order group scan",
    17L -> "the part data window a filter",
    18L -> "stream batch join agg sort small",
    19L -> "vector data spark key column table",
    20L -> "merge row group hash line slow",
    21L -> "filter sort part stream value window",
    22L -> "dup key dup value dup table",
    23L -> "spark table", // < 3 words: fallback shingle = the text itself
    24L -> "order the order a order value")

  /** The suite's distinct word-3-gram shingles, precomputed in plain
    * Scala with EXACTLY TextOps.shingleSet's semantics (single-space
    * split, sliding 3-grams space-joined, < 3 words → the text itself) —
    * inlined by the oracle SQL as a VALUES list, so both engines probe
    * the identical constant set.
    */
  def shingles3: Seq[String] = Texts.flatMap { case (_, t) =>
    val ws = t.split(" ")
    if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSeq else Seq(t)
  }.distinct

  /** SQL literal list of [[shingles3]] for oracle CTEs:
    * `(VALUES ('g1'), ('g2'), ...)`.
    */
  def shinglesValuesSql: String =
    shingles3.map(g => s"('${g.replace("'", "''")}')").mkString(", ")

  private val fixtureDirs =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()

  /** The suite as a parquet table (bench_id, text), written once per
    * session to a temp fixture dir and read back — the production scan
    * shape for a benchmark file that lives beside the pipeline.
    */
  def table(s: SparkSession): DataFrame = {
    val dir = fixtureDirs.computeIfAbsent(System.identityHashCode(s), { _ =>
      val d = java.nio.file.Files.createTempDirectory("graft-evalsuite").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(d)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      import s.implicits._
      Texts.toDF("bench_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$d/bench")
      d
    })
    s.read.parquet(s"$dir/bench")
  }
}
