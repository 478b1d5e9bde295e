package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract: the driver stores a 2000-char TAIL of
  * stdout and parses the JSON line out of it. If the compact line (plus
  * its newline) outgrows the window, the opening brace falls out and the
  * round records `parsed: null` (BENCH_r07/r08 did exactly that) — so
  * the budget is asserted HERE, at the current query count, and suite
  * growth hits this test before it hits the driver.
  */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compact bench line stays inside the driver's stdout tail window at the current query count") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // pessimistic rendering: every row at a 3-char value ("8.8"). Rows
    // that render wider in practice are only the sub-0.1 s two-decimal
    // ones ("0.08", +1 byte each, ~10 rows at r12) — the margin below
    // covers several times that, and shrinks as queries are added, so
    // the failure arrives rounds before the window actually overflows.
    val line = Bench.compactLine(names.map(_ -> 8.8), 888.8)
    // the margin is thin by design: at ~10.5 bytes/row the envelope is
    // already minimal (only the qNN rows remain), so the next overflow
    // needs a structural lever (see compactLine's scaladoc) — this test
    // is the tripwire that forces designing it BEFORE the driver breaks
    val margin = 15
    assert(line.length + 1 <= Bench.StdoutWindowBytes - margin,
      s"compact line is ${line.length}+1 bytes at ${names.size} queries — " +
        s"within ${Bench.StdoutWindowBytes} but inside the $margin-byte " +
        "safety margin: the per-row payload is irreducible without " +
        "renaming qNN keys (cross-round matching depends on them), so the " +
        "line must stop carrying every row — coordinate with the driver")
  }

  test("compact bench line parses as JSON with every non-build row present") {
    import spark.implicits._
    val rows = Seq("q01_agg" -> 0.3, "q106_incr_dedup" -> 1.25,
      "q106_build" -> 9.9, "q90_tiny" -> 0.07, "q17_err" -> -1.0)
    val line = Bench.compactLine(rows, 11.52)
    val parsed = spark.read.json(Seq(line).toDS)
    val fields = parsed.select("queries.*").columns.toSet
    // build rows ride only in target/bench.json; q106's short key is
    // claimed by the serve row first (insertion order), the build row
    // is excluded entirely
    assert(fields === Set("q01", "q106", "q90", "q17"))
    assert(parsed.select("queries.q90").as[Double].head === 0.07,
      "a 70 ms row must not read 0")
    assert(parsed.select("queries.q17").as[Double].head === -1.0,
      "an errored row keeps its -1 sentinel")
  }
}
