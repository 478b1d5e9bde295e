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
    // pessimistic rendering: every row at a 4-char value ("88.8") — wider
    // than any realistic suite (r12's widest rows were "8.8"/"0.07").
    // The overflow policy must keep the line inside the window even here.
    val (line, spilled) = Bench.compactLineSpill(names.map(_ -> 88.8), 888.8)
    assert(line.length + 1 <= Bench.StdoutWindowBytes,
      s"compact line is ${line.length}+1 bytes at ${names.size} queries — " +
        "the overflow policy failed to keep it inside the window")
    // realistic rendering (3-char values): the long-reported prefix of
    // the suite must still ride the line whole — only rows numbered
    // q186+ (the r13 additions, which carry no cross-round history yet)
    // may spill, and spilling more than a handful means the next
    // structural lever is due.
    val (line3, spilled3) = Bench.compactLineSpill(names.map(_ -> 8.8), 888.8)
    assert(line3.length + 1 <= Bench.StdoutWindowBytes)
    def qNum(k: String) = k.drop(1).takeWhile(_.isDigit).toInt
    assert(spilled3.forall(qNum(_) >= 186),
      s"rows with r12 cross-round history spilled from the line: $spilled3")
    assert(spilled3.size <= 3, s"spill growing past the r13 additions " +
      s"($spilled3) — design the next lever before the driver loses rows")
  }

  test("overflow spills only the numerically-highest keys, stable-prefix") {
    // force an overflow with an oversized synthetic suite and check the
    // policy invariants: (a) line fits, (b) a spilled key implies every
    // higher-numbered key is spilled too, (c) kept + spilled = all rows
    val names = (1 to 400).map(i => f"q$i%02d_synthetic")
    val (line, spilled) = Bench.compactLineSpill(names.map(_ -> 8.8), 0.0)
    assert(line.length + 1 <= Bench.StdoutWindowBytes)
    assert(spilled.nonEmpty, "400 rows cannot fit — the policy must spill")
    def qNum(k: String) = k.drop(1).takeWhile(_.isDigit).toInt
    val minSpilled = spilled.map(qNum).min
    val keptNums = names.filterNot(spilled.contains).map(qNum)
    assert(keptNums.forall(_ < minSpilled),
      "spill must evict a numeric suffix, never a row below a kept one")
    assert(spilled.size + keptNums.size === names.size)
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
