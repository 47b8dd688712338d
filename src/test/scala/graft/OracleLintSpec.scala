package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Oracle output-TYPE gate — the regression guard for the HUGEINT
  * failure class that red-boarded `rank1_running_revenue` in round 10
  * (and `graph5_degree_dist` before it): DuckDB silently widens integer
  * aggregates to HUGEINT and `//` keeps the widened type, so ONE uncast
  * window-sum anywhere in the board makes that oracle's serialized
  * values diverge from the Spark longs even when numerically equal.
  *
  * This spec runs EVERY `SparkEntry.oracleSql` entry through DuckDB's
  * binder (via tools/oracle_lint.py, LIMIT 0 — types only, no scan) and
  * fails unless every output column types to the closed allowed set
  * {BIGINT, DOUBLE, VARCHAR, DATE, BOOLEAN, TIMESTAMP} — the types whose
  * DuckDB representation is value-compatible with the Spark parquet the
  * driver hashes against. The JSON handed to the linter comes from the
  * SAME serializer (`Verify.oracleJson`) the driver consumes.
  *
  * Environment contract: DuckDB is a DRIVER-side tool (the correctness
  * gate's oracle engine), not a library dependency — the spec shells out
  * to python3 exactly like the driver does, and CANCELS (not passes)
  * when python3+duckdb or the testdata are absent, so the suite stays
  * green on build-only machines while the gate still runs everywhere
  * the oracle itself runs.
  */
class OracleLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def toolAvailable: Boolean = {
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }
  }

  test("every oracle's output columns type to the driver-hashable set in DuckDB") {
    assume(Files.isDirectory(Paths.get(sfDir)), s"testdata missing: $sfDir")
    assume(toolAvailable, "python3+duckdb unavailable (driver-side tool)")
    val outDir = Paths.get("target/oracle_lint")
    Files.createDirectories(outDir)
    val jsonPath = outDir.resolve("oracle_sql.json")
    Files.writeString(jsonPath, Verify.oracleJson())
    val pb = new ProcessBuilder("python3", "tools/oracle_lint.py",
      sfDir, jsonPath.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    // surface the linter's own report on failure — it names the query
    // and the offending (column, type) pairs
    assert(code == 0, s"oracle type lint failed:\n$out")
    // sanity: the gate actually enumerated the full registry (an empty
    // or truncated json passing silently would be a useless guard)
    val okCount = "(\\d+) ok".r.findFirstMatchIn(out).map(_.group(1).toInt)
    assert(okCount.contains(SparkEntry.oracleSql.size),
      s"lint enumerated ${okCount.getOrElse(-1)} oracles, registry has " +
        s"${SparkEntry.oracleSql.size}:\n$out")
  }
}
