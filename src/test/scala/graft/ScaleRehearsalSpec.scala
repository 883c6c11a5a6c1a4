package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the rehearsal protocol invariants that are pure data — the
  * measurement-attribution rules that, if silently reordered, produce
  * artifacts that gate on cache-attribution instead of plans (the
  * r14 decade-2 near-miss: q126 ordered before q137 would have billed
  * the SA build+walk to the coverage query).
  */
class ScaleRehearsalSpec extends AnyFunSuite {

  test("decade-2 runs the SA family in stage order: build, walk, then consumers") {
    val idx = ScaleRehearsal.decade2Names.zipWithIndex.toMap
    val build = idx("q137_suffix_array")
    val walk = idx("q138_longest_dup_substring")
    assert(build < walk)
    assert(walk < idx("q126_dup_substring_coverage"))
    assert(walk < idx("q127_dup_substring_cut"))
  }

  test("decade-2 SA dependencies precede their dependents and are themselves members") {
    val idx = ScaleRehearsal.decade2Names.zipWithIndex.toMap
    ScaleRehearsal.decade2SaDeps.foreach { case (dep, prereqs) =>
      assert(idx.contains(dep), s"$dep not in decade2Names")
      prereqs.foreach { p =>
        assert(idx.contains(p), s"prerequisite $p not in decade2Names")
        assert(idx(p) < idx(dep), s"$p must run before $dep")
      }
    }
  }

  test("every decade-2 member is in the 10x tier (its last-decade base) and every deferred member has published deferral evidence") {
    ScaleRehearsal.decade2Names.foreach { n =>
      assert(ScaleRehearsal.names.contains(n),
        s"$n gates on its last decade, so it needs a 10x measurement")
      if (!ScaleRehearsal.BytesGateExempt.contains(n))
        assert(ScaleRehearsal.GateDeferralEvidence.contains(n),
          s"$n defers its 1x->10x gate to decade 2 without published evidence")
    }
  }

  test("the 10x tier orders q137 before q138 (build attribution)") {
    val idx = ScaleRehearsal.names.zipWithIndex.toMap
    assert(idx("q137_suffix_array") < idx("q138_longest_dup_substring"))
  }

  test("every decade-2 member carries committed prior evidence for skip-time merge") {
    // r15 verdict #2: the self-contained artifact can only merge what
    // PriorEvidence holds — a member without an entry would regress to
    // the point-at-run-files state the key exists to fix
    ScaleRehearsal.decade2Names.foreach { n =>
      assert(ScaleRehearsal.PriorEvidence.contains(n),
        s"$n has no PriorEvidence entry for the skip-time artifact merge")
      val (v, from) = ScaleRehearsal.PriorEvidence(n)
      assert(v.nonEmpty && from.nonEmpty)
    }
  }

  test("jesc produces valid JSON string content for hostile reasons") {
    val hostile = "line1\nline2\t\"quoted\\path\"\r\u0001ctrl"
    val escaped = ScaleRehearsal.jesc(hostile)
    // must parse as a JSON string and round-trip the original
    val json = "{\"r\":\"" + escaped + "\"}"
    // minimal structural checks without a JSON lib: no raw control
    // chars, no unescaped quotes/backslashes remain
    assert(!escaped.exists(_ < ' '))
    assert(!escaped.replace("\\\\", "").replace("\\\"", "").contains("\""))
    assert(escaped.contains("\\n") && escaped.contains("\\t") &&
      escaped.contains("\\r") && escaped.contains("\\u0001"))
    assert(json.length > hostile.length)
  }

  test("feasibility-checked members are decade-2 members, and q110 precedes the SA family (context-kill isolation)") {
    val idx = ScaleRehearsal.decade2Names.zipWithIndex.toMap
    ScaleRehearsal.Decade2Feasibility.keys.foreach(n =>
      assert(idx.contains(n), s"$n has a feasibility check but is not in decade2Names"))
    assert(idx("q110_triangle_count") < idx("q137_suffix_array"))
  }
}
