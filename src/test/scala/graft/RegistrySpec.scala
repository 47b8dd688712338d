package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: names unique, every query either carries
  * a DuckDB oracle or is on the explicit rows-only allowlist (each entry
  * there has a documented reason and a covering spec).
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique and SQL-safe") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
  }

  test("every registry query carries a DuckDB oracle") {
    // Formerly a 3-entry rows-only allowlist (d7_winnowing,
    // t9_bpe_merges, pq1_adc_topk); each converted to a property-bound
    // oracle (planted-pair / planted-duplicate / first-merge partial
    // contract) in round 7 — keep it empty.
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
