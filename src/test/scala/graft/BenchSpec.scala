package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins [[Bench.mergeRuns]]'s cohort rules — the artifact the judge
  * diffs round-over-round. The r16 defect this spec exists to prevent:
  * a driver-invoked run without `SPARK_GRAFT_ROUND` formed its own
  * single-member "" cohort and shipped its one (most-loaded) run
  * verbatim as all 224 "medians" (+20% on median_total vs the true
  * 13-run median). The fix under test: an unstamped run INHERITS the
  * latest non-empty stamp among fingerprint-matching runs and joins
  * that cohort; the emitted `round` reports the effective stamp.
  */
class BenchSpec extends AnyFunSuite {
  private val om = new ObjectMapper()

  private def runLine(fpr: String, round: String, qs: Map[String, Double]): String = {
    val body = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"fixture":"$fpr","round":"$round","metric":"total","value":0,"unit":"sec","failed":0,"queries":$body,"sf":"/tmp/sf"}"""
  }

  private def withRuns(lines: Seq[String])(f: Path => Unit): Unit = {
    val dir = Files.createTempDirectory("benchspec")
    try {
      lines.zipWithIndex.foreach { case (l, i) =>
        Files.writeString(dir.resolve(f"run_${i + 1}%03d.json"), l + "\n")
      }
      f(dir)
    } finally {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("unstamped invocation inherits the latest non-empty stamp and medians over that cohort") {
    val fpr = "cafebabe"
    // three stamped r17 runs (values 1,2,9 → median 2) + the current
    // UNSTAMPED run (value 7). Pre-fix behavior: cohort {""} = just
    // the current run → "median" 7. Post-fix: cohort r17+current =
    // {1,2,9,7} sorted {1,2,7,9}, lower-middle median = 2.
    val stamped = Seq(1.0, 2.0, 9.0).map(v => runLine(fpr, "r17", Map("q" -> v)))
    val currentLine = runLine(fpr, "", Map("q" -> 7.0))
    withRuns(stamped :+ currentLine) { dir =>
      val out = Bench.mergeRuns(dir, Seq("q" -> 7.0), fpr, currentLine, round = "")
      val j = om.readTree(out)
      assert(j.get("round").asText() === "r17")
      assert(j.get("round_runs").asInt() === 4)
      assert(j.get("medians").get("q").asDouble() === 2.0)
      assert(j.get("median_total").asDouble() === 2.0)
      // the floor is still the all-run min
      assert(j.get("queries").get("q").asDouble() === 1.0)
    }
  }

  test("run files order numerically: run_1000 is newer than run_999") {
    val fpr = "cafebabe"
    val dir = Files.createTempDirectory("benchspec_num")
    try {
      // lexicographically "run_1000" < "run_999", so a string sort
      // would adopt r-old (the run_999 stamp) as the latest; numeric
      // ordering must adopt r-new from run_1000
      Files.writeString(dir.resolve("run_999.json"),
        runLine(fpr, "r-old", Map("q" -> 5.0)) + "\n")
      Files.writeString(dir.resolve("run_1000.json"),
        runLine(fpr, "r-new", Map("q" -> 3.0)) + "\n")
      val cur = runLine(fpr, "", Map("q" -> 3.5))
      val j = om.readTree(Bench.mergeRuns(dir, Seq("q" -> 3.5), fpr, cur, round = ""))
      assert(j.get("round").asText() === "r-new")
      assert(j.get("round_runs").asInt() === 2) // run_1000 + current
    } finally {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("median_total equals a mechanical recompute from the run files") {
    val fpr = "deadbeef"
    val vals = Map(
      "a" -> Seq(3.0, 1.0, 2.0, 5.0, 4.0),
      "b" -> Seq(0.4, 0.2, 0.9, 0.1, 0.3))
    val lines = (0 until 5).map(i =>
      runLine(fpr, "r17", vals.map { case (q, vs) => q -> vs(i) }))
    withRuns(lines) { dir =>
      val cur = Seq("a" -> 4.0, "b" -> 0.3)
      val out = Bench.mergeRuns(dir, cur, fpr, lines.last, round = "r17")
      val j = om.readTree(out)
      // mechanical recompute: lower-middle median over the 5 stamped runs
      def med(vs: Seq[Double]) = { val s = vs.sorted; s((s.size - 1) / 2) }
      val expect = vals.map { case (_, vs) => med(vs) }.sum
      assert(j.get("round_runs").asInt() === 5)
      assert(math.abs(j.get("median_total").asDouble() - expect) < 1e-9)
      assert(j.get("medians").get("a").asDouble() === med(vals("a")))
      assert(j.get("medians").get("b").asDouble() === med(vals("b")))
    }
  }

  test("no stamped run anywhere: empty stamp medians over itself, not -1") {
    val fpr = "0badf00d"
    val cur = runLine(fpr, "", Map("q" -> 3.0))
    withRuns(Seq(cur)) { dir =>
      val j = om.readTree(Bench.mergeRuns(dir, Seq("q" -> 3.0), fpr, cur, round = ""))
      assert(j.get("round").asText() === "")
      assert(j.get("medians").get("q").asDouble() === 3.0)
    }
  }

  test("stamped invocation is unaffected by other rounds' runs") {
    val fpr = "feedface"
    val lines = Seq(
      runLine(fpr, "r16", Map("q" -> 100.0)),
      runLine(fpr, "r17", Map("q" -> 2.0)),
      runLine(fpr, "r17", Map("q" -> 4.0)))
    withRuns(lines) { dir =>
      val j = om.readTree(Bench.mergeRuns(dir, Seq("q" -> 4.0), fpr, lines.last, round = "r17"))
      assert(j.get("round").asText() === "r17")
      assert(j.get("round_runs").asInt() === 2)
      assert(j.get("medians").get("q").asDouble() === 2.0)
    }
  }

  test("round_calibs carries the cohort's load probes in run order; pre-probe runs skipped") {
    val fpr = "ca11b4a7"
    def withCalib(line: String, c: Double): String =
      line.replaceFirst("\\{", s"""{"calib":$c,""")
    val lines = Seq(
      withCalib(runLine(fpr, "r17", Map("q" -> 9.0)), 1.4), // other round: excluded
      runLine(fpr, "r18", Map("q" -> 2.0)),                 // pre-probe run: skipped
      withCalib(runLine(fpr, "r18", Map("q" -> 3.0)), 1.1),
      withCalib(runLine(fpr, "r18", Map("q" -> 4.0)), 2.6))
    withRuns(lines) { dir =>
      val j = om.readTree(Bench.mergeRuns(dir, Seq("q" -> 4.0), fpr, lines.last, round = "r18"))
      val cs = j.get("round_calibs")
      assert(cs.isArray && cs.size === 2)
      assert(cs.get(0).asDouble() === 1.1)
      assert(cs.get(1).asDouble() === 2.6)
    }
  }

  test("failure-honest: current-run failure ships -1 in both floor and median") {
    val fpr = "ab1e5afe"
    val lines = Seq(runLine(fpr, "r17", Map("q" -> 1.0)))
    withRuns(lines) { dir =>
      val j = om.readTree(Bench.mergeRuns(dir, Seq("q" -> -1.0), fpr,
        runLine(fpr, "r17", Map("q" -> -1.0)), round = "r17"))
      assert(j.get("queries").get("q").asDouble() === -1.0)
      assert(j.get("medians").get("q").asDouble() === -1.0)
    }
  }
}
