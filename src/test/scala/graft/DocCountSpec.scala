package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-count drift guard (round-9 verdict item 6): round 8 shipped stale
  * README/BASELINE counts that contradicted the artifacts and were fixed
  * by hand; this makes the guard structural. README.md's driver-contract
  * line is the ONE canonical statement of the query/oracle counts — this
  * spec parses it and fails the build the moment a doc edit (or a new
  * query without a README bump) lets prose and code diverge. No Spark
  * session needed: the contract maps are plain Scala values.
  */
class DocCountSpec extends AnyFunSuite {

  test("README's canonical driver-contract counts match SparkEntry") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val line =
      "driver contract: (\\d+) queries \\+ DuckDB oracle SQL \\((\\d+) paired\\)"
        .r.findFirstMatchIn(readme)
    assert(line.isDefined,
      "README.md lost the canonical 'driver contract: N queries + DuckDB " +
        "oracle SQL (M paired)' line")
    assert(line.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${line.get.group(1)} queries, " +
        s"SparkEntry.queries has ${SparkEntry.queries.size}")
    assert(line.get.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${line.get.group(2)} oracle-paired, " +
        s"SparkEntry.oracleSql has ${SparkEntry.oracleSql.size}")
  }

  test("every oracle pairs an existing query and every query is paired") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
    val unpaired = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // round 11 closed the last rows-only row: the HLL audit now pairs
    // via the envelope-verdict shape (each engine asserts its own
    // sketch against the shared exact counts)
    assert(unpaired.isEmpty, s"unexpected rows-only queries: $unpaired")
  }
}
