package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.text.Retrieval

/** Prints the MaxScore-pruning cost frontier COVERAGE.md cites (not part
  * of the library surface): plant a Zipf-shaped corpus — every doc
  * carries the same stopword set (df = N posting lists, the traversal
  * cost WAND exists to avoid) plus a handful of rare needle terms — and
  * run a needle-query workload through the full traversal
  * ([[Retrieval.bm25TopKWith]]) and the pruned path
  * ([[Retrieval.bm25TopKMaxScore]]), reporting wall-clock and the scored
  * (query, doc) pair count each traversal actually paid for. The pruned
  * path's certificate must certify every needle query (no fallback), and
  * the outputs must match exactly — the savings are real only if the
  * answer is unchanged. Usage:
  *   SPARK_GRAFT_DOCS=200000 sbt "runMain graft.tools.MaxScoreBench"
  */
object MaxScoreBench {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DOCS", "200000").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val queryCounts = sys.env.getOrElse("SPARK_GRAFT_NQ", "16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Zipf plant: 20 stopwords in every doc; each doc also carries 3
    // deterministic "mid" terms (df ≈ n/50) and docs % 1000 < 5 carry a
    // rare needle (df ≈ n/200 per needle id). Queries pair one needle
    // with three stopwords — the adversarial-but-realistic workload:
    // high-impact rare terms decide the ranking, low-idf stopword lists
    // dominate the unpruned traversal.
    val stop = (1 to 20).map(i => s"s$i").mkString(" ")
    val corpus = spark.range(nDocs.toLong).select(
      col("id").as("doc_id"),
      concat_ws(" ", lit(stop),
        concat(lit("m"), col("id") % 50),
        concat(lit("m"), (col("id") + 17) % 50),
        concat(lit("m"), (col("id") + 33) % 50),
        when(col("id") % 1000 < 5,
          concat(lit("needle"), col("id") % 5)).otherwise(lit("")))
        .as("text"))
    val post = graft.text.Dedup.materialize(Retrieval.postings(corpus))
    val df = graft.text.Dedup.materialize(Retrieval.docFreq(post))
    val totals = Retrieval.corpusTotals(post)
    println(s"corpus n=$nDocs, postings=${post.count()}")
    val dfMap = df.as[(String, Long)].collect().toMap

    // The cutoff is DERIVED from the df distribution, not hand-tuned:
    // largest cutoff whose Σ essential df fits the candidate broadcast
    // budget (here scaled to the corpus so the bench exercises the
    // crossover at any SPARK_GRAFT_DOCS; a deployment passes its real
    // RAM-derived budget). On this plant it must land in the Zipf gap —
    // above every needle df (≈ n/1000, so pruning keeps its candidates)
    // and below the stopword df (= n, so the long lists stay skipped).
    val derived = Retrieval.deriveEssentialDfMax(df,
      candidateBudget = 2L * nDocs)
    println(s"derived essentialDfMax=$derived " +
      s"(needle df≈${nDocs / 1000}, stopword df=$nDocs)")
    require(derived >= nDocs / 1000 && derived < nDocs,
      s"derived cutoff $derived missed the planted Zipf crossover")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
      var out: Set[(Long, Long, Long)] = Set.empty
      val secs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        out = mk.as[(Long, Long, Long)].collect().toSet
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-12s serve=${secs.min}%6.2f s  rows=${out.size}")
      out
    }
    // The workload axis that decides the trade: the full traversal's
    // scored pairs grow LINEARLY in query count (every query drags its
    // stopword lists through the score join), while the pruned path's
    // dominant cost — two flat passes over the postings (candidate
    // generation + the doc semi-join) — does not. This is precisely the
    // "query volume grows with N" regime Retrieval's scaladoc defers to
    // WAND; on a term-bucketed store the flat passes prune further.
    for (nQueries <- queryCounts) {
      val queries = (0 until nQueries).flatMap { q =>
        Seq((q.toLong, s"needle${q % 5}"), (q.toLong, s"s${q % 20 + 1}"),
          (q.toLong, s"s${(q + 7) % 20 + 1}"), (q.toLong, s"s${(q + 13) % 20 + 1}"))
      }.toDF("query_id", "term")
      val qterms = queries.as[(Long, String)].collect()
      val fullPairs = qterms.map(t => dfMap.getOrElse(t._2, 0L)).sum
      val candBound = qterms.map(_._2).distinct
        .filter(t => dfMap.getOrElse(t, Long.MaxValue) <= nDocs / 100)
        .map(dfMap).sum
      println(s"-- queries=$nQueries x 4 terms: scored pairs full=$fullPairs, " +
        s"pruned candidates<=$candBound")
      val full = time(s"full/$nQueries")(
        Retrieval.bm25TopKWith(post, df, totals, queries))
      // the derived cutoff sits between the needle df and the stopword
      // df (asserted above) — no per-corpus tuning
      val pruned = time(s"pruned/$nQueries")(
        Retrieval.bm25TopKMaxScore(post, df, totals, queries,
          essentialDfMax = derived))
      require(pruned == full, "pruning changed the answer — BUG")
      println(s"   outputs identical: true")
    }
  }
}
