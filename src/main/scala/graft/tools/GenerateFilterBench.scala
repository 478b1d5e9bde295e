package graft.tools

import org.apache.spark.sql.functions._

/** Evidence generator for the `InferFiltersFromGenerate` exclusion in
  * [[graft.Sessions.local]] (r15): A/B the winnow family's
  * explode-over-computed-array shape with the rule on vs off.
  *
  * The rule copies a Generate's input expression into an inferred
  * `size(e) > 0 AND isnotnull(e)` filter; pushdown substitutes the
  * defining Project's expression into it, and subexpression elimination
  * hoists the copy above the cheap predicates' short-circuit — so the
  * per-gram md5 transform runs once per INPUT row (even rows an earlier
  * length filter excludes) on top of its legitimate evaluation.
  * Representative run at sf0.1, min-of-3 (this box, clean phase):
  *
  *   byteFingerprints over all docs (q208's shape):  8.9 s -> 1.65 s
  *   same over an EMPTY >1 MiB cohort (q204's guard): 7.9 s -> 0.47 s
  *
  * Usage: `sbt "runMain graft.tools.GenerateFilterBench"` — prints both
  * cells of the A/B. The session default excludes the rule, so the "on"
  * leg re-enables it explicitly; PlanSpec pins the plan-level absence.
  */
object GenerateFilterBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def media = graft.multimodal.Binary.withPayload(
      graft.Tables(spark, dir).documents
        .repartition(spark.sparkContext.defaultParallelism))
    def time(name: String)(body: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[genfilter] $name: min ${ts.min}%.2f s  " +
        s"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // `def`: each leg must re-optimize under the current conf (a cached
    // QueryExecution would silently reuse the other leg's plan)
    def fpsAll = graft.multimodal.Binary.byteFingerprints(media)
    def fpsEmpty = graft.multimodal.Binary.byteFingerprints(
      media.filter(length(col("payload")) > (1 << 20)))
    Seq("" -> "rule EXCLUDED (session default)",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
          -> "rule ACTIVE").foreach { case (_, label) =>
      // the session default already excludes; the ACTIVE leg clears it
      if (label.contains("ACTIVE"))
        spark.conf.set("spark.sql.optimizer.excludedRules", "")
      time(s"q208 shape, $label")(noop(fpsAll))
      time(s"empty >1MiB cohort, $label")(noop(fpsEmpty))
    }
    spark.stop()
  }
}
