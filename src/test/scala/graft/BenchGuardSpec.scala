package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchGuardSpec extends AnyFunSuite {

  private val ref = BenchGuard.PassRef(
    total = 18.0,
    perQuery = (1 to 60).map(i => s"q$i" -> 0.3).toMap,
    artifact = "BENCH_FULL_r13.json")

  test("uniform inflation of most queries above 1.5x total is the " +
      "contention signature (the r13 gate artifact shape)") {
    val contended = (1 to 60).map(i => s"q$i" -> 0.9) // 3x everywhere
    val sig = BenchGuard.signature(contended, ref)
    assert(sig.contended && sig.totalRatio > 2.9 && sig.inflatedFrac > 0.99)
  }

  test("a real regression concentrated in a few queries is NOT rejected, " +
      "however large the total delta") {
    // 3 queries blow up 20x, the rest stay flat: total 18 → 35.1 (1.95x)
    val regressed = (1 to 60).map(i => s"q$i" -> (if (i <= 3) 6.0 else 0.3))
    val sig = BenchGuard.signature(regressed, ref)
    assert(!sig.contended, s"non-uniform regression must publish: $sig")
    assert(sig.totalRatio > 1.5 && sig.inflatedFrac < 0.2)
  }

  test("a clean run inside the host-noise band is not rejected") {
    val noisy = (1 to 60).map(i => s"q$i" -> 0.3 * (if (i % 2 == 0) 1.3 else 1.1))
    assert(!BenchGuard.signature(noisy, ref).contended)
  }

  test("the detector abstains on too few comparable queries, sub-50ms " +
      "reference rows, and a missing reference") {
    val tiny = BenchGuard.PassRef(2.0, (1 to 60).map(i => s"q$i" -> 0.01).toMap, "x")
    assert(BenchGuard.signature((1 to 60).map(i => s"q$i" -> 1.0), tiny)
      == BenchGuard.NoSignature, "all-sub-50ms reference rows are noise")
    val few = BenchGuard.PassRef(3.0, (1 to 5).map(i => s"q$i" -> 0.6).toMap, "x")
    assert(BenchGuard.signature((1 to 5).map(i => s"q$i" -> 6.0), few)
      == BenchGuard.NoSignature, "below minCompared the referee abstains")
    // renamed catalog: no overlap → abstain
    val renamed = (1 to 60).map(i => s"r$i" -> 9.0)
    assert(BenchGuard.signature(renamed, ref) == BenchGuard.NoSignature)
  }

  test("focalSuspects names exactly the rows the reference says should " +
      "be fast but measured inflated — the r15 gate-artifact shape the " +
      "uniform detector is blind to") {
    // reference: mostly 0.3s rows; current pass: 4 rows inflated 2-3x
    // (focal), everything else inside noise — inflated_frac ~0.07 would
    // never trip signature(), yet the total moved by the focal rows
    val cur = (1 to 60).map { i =>
      s"q$i" -> (if (i <= 4) 0.3 * (i + 1) else 0.31)
    }
    val suspects = BenchGuard.focalSuspects(cur, ref)
    assert(suspects.map(_.name) == Seq("q4", "q3", "q2", "q1"),
      s"slowest absolute inflation first: $suspects")
    assert(!BenchGuard.signature(cur, ref).contended,
      "the whole-pass referee must NOT own this shape — that is the point")
  }

  test("focalSuspects is bounded, skips sub-minRefSec reference rows, " +
      "and abstains without a reference row") {
    val manyInflated = (1 to 60).map(i => s"q$i" -> 0.9) // 3x everywhere
    assert(BenchGuard.focalSuspects(manyInflated, ref).length == 16,
      "the retry budget caps at maxRetries even when everything inflates")
    val tinyRef = BenchGuard.PassRef(1.0, Map("q1" -> 0.01), "x")
    assert(BenchGuard.focalSuspects(Seq("q1" -> 1.0), tinyRef).isEmpty,
      "a sub-50ms reference row is noise in both directions")
    assert(BenchGuard.focalSuspects(Seq("new_query" -> 9.0), ref).isEmpty,
      "a query the reference never measured has no focal verdict")
  }

  test("min-merge over a focal retry publishes a genuine regression: " +
      "slow on both executions stays slow") {
    // the policy is min(first, retry) per suspect — simulate a real 4x
    // regression (retry also slow) vs a burst (retry back to reference)
    val regressedRetry = math.min(1.2, 1.19) // both executions ~4x of 0.3
    assert(regressedRetry > 0.3 * 1.5, "the published number still shows it")
    val burstRetry = math.min(1.2, 0.31)
    assert(burstRetry < 0.3 * 1.5, "a one-off burst is repaired")
  }

  test("maybeUpdateBest is monotone per SF: only a strictly faster " +
      "error-free run replaces the standing best, and another SF's run " +
      "never clobbers it") {
    val dir = java.nio.file.Files.createTempDirectory("bench-best")
    def art(total: Double, sf: String) =
      s"""{"value":$total,"queries":{"a":$total},"failed":[],"sf":"$sf"}"""
    assert(BenchGuard.maybeUpdateBest(dir, art(14.3, "/d/sf0.1"), 14.3,
      eligible = true, sf = "/d/sf0.1"), "first clean run seeds the best")
    assert(!BenchGuard.maybeUpdateBest(dir, art(23.9, "/d/sf0.1"), 23.9,
      eligible = true, sf = "/d/sf0.1"), "a slower run never replaces it")
    assert(!BenchGuard.maybeUpdateBest(dir, art(2.0, "/d/sf0.001"), 2.0,
      eligible = true, sf = "/d/sf0.001"),
      "an experiment at another SF must not evict the gate SF's baseline")
    assert(!BenchGuard.maybeUpdateBest(dir, art(1.0, "/d/sf0.1"), 1.0,
      eligible = false, sf = "/d/sf0.1"), "ineligible (errored/contended) never writes")
    assert(BenchGuard.maybeUpdateBest(dir, art(12.0, "/d/sf0.1"), 12.0,
      eligible = true, sf = "/d/sf0.1"), "a faster clean run replaces it")
    val Some(best) = BenchGuard.reference(dir, "value", "queries",
      sf = Some("/d/sf0.1"))
    assert(best.artifact == BenchGuard.BestArtifactName && best.total == 12.0,
      s"reference() must see the standing best: $best")
  }

  private val sample =
    """{"metric":"total","value":18.366,"unit":"sec","queries":{"q1_agg":0.123,"dd_minhash":1.204},""" +
    """"failed":[],"load1_cold_before":1.2,"warm_total":14.674,""" +
    """"queries_warm":{"q1_agg":0.080,"dd_minhash":0.801},""" +
    """"warm_total_attempts":[{"sec":14.674,"errs":0}],"sf":"/root/testdata/sf0.1"}"""

  test("parsePass pulls the cold and warm pass out of a bench artifact, " +
      "and warm_total is not confused with warm_total_attempts") {
    val Some((cold, coldQ)) = BenchGuard.parsePass(sample, "value", "queries")
    assert(cold == 18.366 && coldQ == Map("q1_agg" -> 0.123, "dd_minhash" -> 1.204))
    val Some((warm, warmQ)) = BenchGuard.parsePass(sample, "warm_total", "queries_warm")
    assert(warm == 14.674 && warmQ("q1_agg") == 0.080)
    assert(BenchGuard.cleanFailed(sample))
    assert(!BenchGuard.cleanFailed(sample.replace("\"failed\":[]", "\"failed\":[\"x\"]")))
    assert(BenchGuard.parsePass(sample, "nope", "queries").isEmpty)
  }

  test("reference picks the best error-free committed artifact among the " +
      "newest three — one contended committed round cannot poison it") {
    val dir = java.nio.file.Files.createTempDirectory("bench-guard")
    def write(r: Int, total: Double, failed: String): Unit =
      java.nio.file.Files.write(dir.resolve(s"BENCH_FULL_r$r.json"),
        (s"""{"value":$total,"queries":{"a":${total / 2},"b":${total / 2}},""" +
          s""""failed":$failed}""").getBytes("UTF-8"))
    write(10, 5.0, "[]")    // old — outside the newest-3 window
    write(11, 17.0, "[]")
    write(12, 16.8, "[]")
    write(13, 55.2, "[]")   // the contended committed artifact
    val Some(ref) = BenchGuard.reference(dir, "value", "queries")
    assert(ref.total == 16.8 && ref.artifact == "BENCH_FULL_r12.json")
    // artifacts with failures lose to any clean sibling
    write(14, 1.0, """["q_broken"]""")
    val Some(ref2) = BenchGuard.reference(dir, "value", "queries")
    assert(ref2.total == 16.8, "an errored pass's small total must not referee")
    // SF-mismatched artifacts never referee (a 10x SF inflates every
    // query uniformly — exactly the contention signature)
    java.nio.file.Files.write(dir.resolve("BENCH_FULL_r15.json"),
      """{"value":2.0,"queries":{"a":1.0,"b":1.0},"failed":[],"sf":"/d/sf0.001"}"""
        .getBytes("UTF-8"))
    val ref3 = BenchGuard.reference(dir, "value", "queries", sf = Some("/d/sf0.1"))
    assert(ref3.isEmpty, s"newest-3 window holds r15/r14/r13; only the " +
      s"sf-matched may referee and none of those three are: $ref3")
    assert(BenchGuard.reference(
      java.nio.file.Files.createTempDirectory("bench-guard-empty"),
      "value", "queries").isEmpty)
  }
}
