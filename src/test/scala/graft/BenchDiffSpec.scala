package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** In-suite face of the bench drift gate (tools/bench_diff.py) — wired
  * next to the two oracle lints the way OrderLintSpec wired the tie
  * gate: the last three committed full-board runs (bench/history.jsonl)
  * must JOINTLY adjudicate clean against the rolling per-query best —
  * min-of-N, because a plan regression persists across exclusive runs
  * while this host's noise moves between them (measured r14: identical
  * trees back-to-back swing individual sub-second queries ±60% and
  * totals ±16% with clean sentinels; single-run ratio gating flags ~5
  * random queries every time). Exit contract: 0 = clean (pass), 1 = a
  * query regressed persistently (fail), 2 = not adjudicated
  * (contaminated sentinel or missing records — CANCEL, not pass: that
  * is an environment statement, and failing on it would make every
  * non-exclusive test run cry wolf).
  */
class BenchDiffSpec extends AnyFunSuite {

  test("committed bench runs adjudicate clean against the rolling per-query best (min-of-3)") {
    assume(Files.exists(Paths.get("bench/history.jsonl")),
      "no committed bench history")
    val pb = new ProcessBuilder("python3", "tools/bench_diff.py",
      "--history-runs", "3")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    assume(code != 2, s"bench run not adjudicable here:\n$out")
    assert(code == 0, s"bench drift gate flagged a regression:\n$out")
    assert(out.contains("== bench drift gate:"), s"unexpected output:\n$out")
  }

  test("negative control: a synthetic 2x regression on a heavy query still flags (exit 1)") {
    assume(Files.exists(Paths.get("bench/bench.json")),
      "no committed bench run")
    // inflate the heaviest >=1.3s query of the committed run by 2x —
    // past both the 1.5x ratio gate and the 1s absolute-delta floor —
    // and the tool must exit 1; guards the calibration against ever
    // being loosened into a gate that cannot fail
    val raw = new String(Files.readAllBytes(Paths.get("bench/bench.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    // only the per-query entries — the top-level "value"/sentinel floats
    // must not be mistaken for a query name
    val qBlock = raw.substring(raw.indexOf("\"queries\":{"))
    val heavy = "\"([A-Za-z0-9_]+)\":([0-9]+\\.[0-9]+)".r
      .findAllMatchIn(qBlock)
      .filter(m => m.group(2).toDouble >= 1.3)
      .maxBy(_.group(2).toDouble)
    val doubled = raw.replace(
      s""""${heavy.group(1)}":${heavy.group(2)}""",
      s""""${heavy.group(1)}":${heavy.group(2).toDouble * 2}""")
    val tmp = Files.createTempFile("graft-benchdiff", ".json")
    Files.writeString(tmp, doubled)
    val pb = new ProcessBuilder("python3", "tools/bench_diff.py",
      tmp.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    Files.deleteIfExists(tmp)
    assume(code != 2, s"bench run not adjudicable here:\n$out")
    assert(code == 1 && out.contains(s"REGRESSION ${heavy.group(1)}"),
      s"doubled ${heavy.group(1)} must flag; got exit $code:\n$out")
  }

  test("negative control: a CONTAMINATED newest history entry refuses adjudication (exit 2)") {
    // round-14 advisory: the contamination filter must not silently
    // slide the min-of-N window back onto older clean runs — if the
    // tree's most recent full-board measurement was contaminated, 'ok'
    // over older runs would claim a judgment that never happened
    def entry(q1: Double, spread: Double): String =
      s"""{"metric":"t","value":${q1 + 1},"sf":"sf0.1","spread":$spread,"queries":{"q1":$q1,"q2":1.0}}"""
    val tmp = Files.createTempFile("graft-benchdiff-hist", ".jsonl")
    Files.writeString(tmp,
      entry(1.0, 1.0) + "\n" + entry(1.1, 1.0) + "\n" +
        entry(1.0, 9.9) + "\n") // newest: spread 9.9 > 1.5 — contaminated
    val pb = new ProcessBuilder("python3", "tools/bench_diff.py",
      "--history-runs", "2", "--history", tmp.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    Files.deleteIfExists(tmp)
    assert(code == 2 && out.contains("NOT ADJUDICATED"),
      s"contaminated newest entry must exit 2, got $code:\n$out")
  }
}
