package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Oracle ORDER-determinism gate — the automated guard for the
  * tie-hazard class (the rank1 lesson, generalized the way
  * OracleLintSpec generalized the HUGEINT lesson).
  *
  * The driver hashes rows in oracle ORDER BY order, so any oracle whose
  * top-level ORDER BY is not a total order is nondeterministic across
  * engines the moment the data grows ties — both engines sort
  * "correctly" and the row-for-row hash still diverges. Individual
  * queries used to reason about this ad hoc in comments; 247 oracles of
  * hand-reasoning is exactly how rank1 red-boarded in round 9.
  *
  * This spec runs EVERY `SparkEntry.oracleSql` entry through
  * tools/order_lint.py at sf0.01 (the SF the driver's correctness gate
  * actually hashes), which asserts per oracle that no ORDER BY key
  * group contains two DISTINCT full rows — exact full-row duplicates
  * are hash-invariant under any permutation and pass; only ties that
  * could genuinely reorder different rows fail. Top-k oracles are
  * checked on the PRE-limit set (boundary ties are where engines pick
  * different rows). The tool also fails oracles with NO top-level
  * ORDER BY, since the driver compare is row-for-row.
  *
  * Same environment contract as OracleLintSpec: DuckDB is a
  * driver-side tool — the spec shells out to python3 like the driver
  * does and CANCELS (not passes) when python3+duckdb or the testdata
  * are absent.
  */
class OrderLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.01"

  private def toolAvailable: Boolean = {
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }
  }

  test("every oracle's top-level ORDER BY is a total order at sf0.01 (up to full-row dups)") {
    assume(Files.isDirectory(Paths.get(sfDir)), s"testdata missing: $sfDir")
    assume(toolAvailable, "python3+duckdb unavailable (driver-side tool)")
    val outDir = Paths.get("target/order_lint")
    Files.createDirectories(outDir)
    val jsonPath = outDir.resolve("oracle_sql.json")
    Files.writeString(jsonPath, Verify.oracleJson())
    val pb = new ProcessBuilder("python3", "tools/order_lint.py",
      sfDir, jsonPath.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    assert(code == 0, s"oracle order lint failed:\n$out")
    // the gate must have enumerated the full registry: ok + whitelisted
    // (every whitelist entry carries a hash-invariance proof in-tool)
    val counted = "(\\d+) ok / (\\d+) bad / (\\d+) whitelisted".r
      .findFirstMatchIn(out)
      .map(m => m.group(1).toInt + m.group(2).toInt + m.group(3).toInt)
    assert(counted.contains(SparkEntry.oracleSql.size),
      s"lint enumerated ${counted.getOrElse(-1)} oracles, registry has " +
        s"${SparkEntry.oracleSql.size}:\n$out")
  }
}
