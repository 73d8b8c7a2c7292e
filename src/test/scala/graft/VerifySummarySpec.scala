package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the `summary.json` body [[Verify]] writes next to its dump:
  * the artifact exists so a truncated/empty driver correctness file is
  * distinguishable from "Verify ran and produced nothing" (round 11
  * shipped `{}` with no way to tell). The body must stay valid JSON
  * under hostile query names — it shares [[Verify.jsonStr]] with the
  * oracle SQL dump, whose escaping the driver's json.load depends on.
  */
class VerifySummarySpec extends AnyFunSuite {

  test("summary body carries counts, wall time, and failed names") {
    val s = Verify.summaryJson(167, Seq("q_bad", "q_worse"), 154.26)
    assert(s === """{"n_queries": 169, "n_ok": 167, "n_failed": 2, """ +
      """"wall_sec": 154.3, "failed": ["q_bad","q_worse"]}""")
  }

  test("clean run: empty failed list, zero failures") {
    val s = Verify.summaryJson(169, Nil, 60.0)
    assert(s.contains(""""n_failed": 0""") && s.endsWith(""""failed": []}"""))
  }

  test("failed names with quotes/control chars stay valid JSON") {
    val ctl = 1.toChar.toString
    val s = Verify.summaryJson(0, Seq("a\"b\\c", "t\tn\nr\rz", ctl), 0.049)
    assert(s.contains("""["a\"b\\c","t\tn\nr\rz",""" + "\"\\u0001\"]"))
    // no raw control characters survive into the artifact
    assert(!s.exists(c => c < ' '))
  }
}
