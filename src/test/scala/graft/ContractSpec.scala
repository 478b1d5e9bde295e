package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the query/oracle maps SparkEntry merges
  * from four modules must compose without silent shadowing (`++` keeps
  * the right-hand entry on a duplicate key — a collision would quietly
  * replace one query with another and the correctness gate would test
  * the wrong code).
  */
class ContractSpec extends AnyFunSuite {

  test("query keys are collision-free across the merged modules") {
    val parts = Seq(
      "text" -> graft.text.Queries.all.keySet,
      "vector" -> graft.vector.Queries.all.keySet,
      "extra" -> graft.extra.Queries.all.keySet)
    val coreKeys = SparkEntry.queries.keySet --
      parts.map(_._2).reduce(_ ++ _)
    val all = ("core" -> coreKeys) +: parts
    for {
      (an, as) <- all; (bn, bs) <- all if an < bn
    } assert((as & bs).isEmpty, s"$an and $bn both define: ${(as & bs).mkString(", ")}")
    assert(SparkEntry.queries.size ===
      all.map(_._2.size).sum, "merged size must equal the sum of parts")
  }

  test("every oracle references an existing query; every query is oracle-gated") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${(os -- qs).mkString(", ")}")
    // since r6 (q66's recursive-CTE oracle) the contract is total: a new
    // query without an oracle is a red row in the driver gate, fail here
    assert((qs -- os).isEmpty,
      s"queries without an oracle: ${(qs -- os).mkString(", ")}")
  }

  test("COUNTS.md is the generated inventory, in sync with the live maps") {
    // r11 VERDICT #8: hand-maintained counts drifted twice in two rounds —
    // the checked-in COUNTS.md must be byte-identical to what the code
    // generates, so README/COVERAGE can quote it as a provable number
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COUNTS.md")), "UTF-8")
    assert(onDisk === Counts.render,
      "COUNTS.md is stale — regenerate with `sbt \"runMain graft.Counts\"`")
  }

  test("every query name follows the qNN_ naming scheme and is unique by number") {
    val names = SparkEntry.queries.keySet.toSeq
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), "naming scheme")
    val nums = names.map(_.takeWhile(_ != '_').drop(1).toInt)
    assert(nums.distinct.size === nums.size, "duplicate query numbers")
  }
}
