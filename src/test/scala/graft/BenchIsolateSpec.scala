package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's placement-artifact classifier: a row whose in-sweep
  * median breaches the gate against the previous round's record is
  * re-run in a FORKED JVM, and the artifact records BOTH values. The
  * machinery shipped in round 15 but had never fired on a real
  * breach — this spec forces one and pins the contract end to end:
  * the fork actually runs (a real isolated median comes back), the
  * sweep value is carried through unchanged, and the no-breach /
  * disabled paths stay empty. */
class BenchIsolateSpec extends AnyFunSuite {

  /** The newest committed bench record for sf0.1 — the same artifact
    * `BenchIsolate.previousMedians` resolves, read here independently
    * so the test can fabricate a value that provably breaches the
    * 1.5× + 1 s gate against it. */
  private def prevMedian(name: String): Option[Double] = {
    val rx = "BENCH(?:_LOCAL)?_r(\\d+).*\\.json".r
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .toSeq.flatMap(f => f.getName match {
        case rx(n) => Some((n.toInt, f)); case _ => None
      }).sortBy(-_._1).map(_._2)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    files.iterator.flatMap { f =>
      try {
        var node = om.readTree(f)
        if (node.has("parsed") && !node.get("parsed").isNull) node = node.get("parsed")
        val sfOk = !node.has("sf") ||
          new java.io.File(node.get("sf").asText("")).getName == "sf0.1"
        val qs = node.get("queries")
        if (sfOk && qs != null && qs.has(name)) Some(qs.get(name).asDouble())
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }.nextOption()
  }

  test("a forced breach re-runs in a forked JVM; both values recorded, caps and guards hold") {
    val name = "agg_count" // cheap at sf0.1: the fork costs session startup, not query time
    val old = prevMedian(name).getOrElse(
      cancel("no committed sf0.1 bench record in cwd — nothing to breach against"))
    val breach = math.max(old * 2, old + 2.0) // clears 1.5x AND the 1 s floor
    // a non-breaching row and an errored row must never fork
    val calm = Seq(("agg_sum", prevMedian("agg_sum").getOrElse(0.1)))
    val (none, unclassified0) = BenchIsolate.classify(
      calm, errored = Set.empty, pairFamily = Set.empty, "/root/testdata/sf0.1")
    assert(none.isEmpty && unclassified0 === 0)
    val (classified, unclassified) = BenchIsolate.classify(
      Seq((name, breach), ("agg_errored", 999.0)),
      errored = Set("agg_errored"), pairFamily = Set.empty,
      "/root/testdata/sf0.1")
    assert(unclassified === 0, "the fork must succeed, not fall to unclassified")
    assert(classified.size === 1, s"exactly the forced breach classifies: $classified")
    val (n, (sweepV, isoV)) = classified.head
    assert(n === name)
    assert(sweepV === breach, "the in-sweep value must be recorded unchanged")
    assert(isoV > 0 && isoV < breach,
      s"the forked re-run must produce a real (smaller) median, got $isoV vs sweep $breach")
    // pair-family rows are incomparable by contract and never fork
    val (pf, _) = BenchIsolate.classify(Seq((name, breach)),
      errored = Set.empty, pairFamily = Set(name), "/root/testdata/sf0.1")
    assert(pf.isEmpty)
  }
}
