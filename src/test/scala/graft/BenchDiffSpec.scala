package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** In-suite face of the bench drift gate (tools/bench_diff.py) — wired
  * next to the two oracle lints the way OrderLintSpec wired the tie
  * gate: the committed bench/bench.json must adjudicate clean against
  * the rolling per-query best in the committed records. Exit contract:
  * 0 = clean (pass), 1 = a query regressed >1.5× against its best
  * (fail), 2 = not adjudicated (contaminated sentinel or missing
  * records — CANCEL, not pass: that is an environment statement, and
  * failing on it would make every non-exclusive test run cry wolf).
  */
class BenchDiffSpec extends AnyFunSuite {

  test("committed bench run adjudicates clean against the rolling per-query best") {
    assume(Files.exists(Paths.get("bench/bench.json")),
      "no committed bench run")
    val pb = new ProcessBuilder("python3", "tools/bench_diff.py")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    assume(code != 2, s"bench run not adjudicable here:\n$out")
    assert(code == 0, s"bench drift gate flagged a regression:\n$out")
    assert(out.contains("== bench drift gate:"), s"unexpected output:\n$out")
  }
}
