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

  test("rows-only queries are exactly the documented allowlist") {
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name).toSet
    val allowed = Set(
      "d7_winnowing",      // engine-specific rolling hashes; guarantee spec
      "t9_bpe_merges",     // iterative merge state not SQL-expressible; hand-computed spec
      "pq1_adc_topk")      // quantized distances are model-internal; ADC-identity/cluster specs
    assert(rowsOnly == allowed,
      s"unexpected rows-only queries: ${rowsOnly -- allowed}; missing: ${allowed -- rowsOnly}")
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
