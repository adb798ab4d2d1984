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
      "seeds its OWN slot instead of evicting (or being locked out by) " +
      "the gate SF's baseline") {
    val dir = java.nio.file.Files.createTempDirectory("bench-best")
    def art(total: Double, sf: String) =
      s"""{"value":$total,"queries":{"a":$total},"failed":[],""" +
        s""""action_rev":${BenchGuard.ActionRev},"sf":"$sf"}"""
    assert(BenchGuard.maybeUpdateBest(dir, art(14.3, "/d/sf0.1"), 14.3,
      eligible = true, sf = "/d/sf0.1"), "first clean run seeds the per-SF slot")
    assert(java.nio.file.Files.isRegularFile(
      dir.resolve(BenchGuard.bestArtifactNameFor("/d/sf0.1"))))
    assert(!java.nio.file.Files.isRegularFile(dir.resolve(BenchGuard.BestArtifactName)),
      "a VACANT legacy slot is left vacant — any-SF claiming would be the " +
        "mirror image of the r16 lockout (review r17)")
    // seed the legacy as the gate SF's record — the committed-repo state
    java.nio.file.Files.write(dir.resolve(BenchGuard.BestArtifactName),
      art(14.3, "/d/sf0.1").getBytes("UTF-8"))
    assert(!BenchGuard.maybeUpdateBest(dir, art(23.9, "/d/sf0.1"), 23.9,
      eligible = true, sf = "/d/sf0.1"), "a slower run never replaces it")
    // ADVICE r16: an experiment SF seeds BENCH_BEST_<leaf>.json and
    // leaves the legacy gate-SF file untouched — previously it was
    // rejected outright, and had IT come first the gate SF would have
    // been permanently locked out of a standing best
    assert(BenchGuard.maybeUpdateBest(dir, art(2.0, "/d/sf0.001"), 2.0,
      eligible = true, sf = "/d/sf0.001"),
      "another SF's clean run seeds its own per-SF slot")
    assert(java.nio.file.Files.isRegularFile(
      dir.resolve(BenchGuard.bestArtifactNameFor("/d/sf0.001"))))
    assert(java.nio.file.Files.readString(dir.resolve(BenchGuard.BestArtifactName))
      .contains("\"sf\":\"/d/sf0.1\""), "the gate SF's legacy slot is untouched")
    assert(!BenchGuard.maybeUpdateBest(dir, art(1.0, "/d/sf0.1"), 1.0,
      eligible = false, sf = "/d/sf0.1"), "ineligible (errored/contended) never writes")
    // leaf collision: a DIFFERENT SF string whose dir leaf matches the
    // gate SF's resolves to the same per-SF filename — it must be
    // vetoed, never silently clobber the gate baseline (review r17)
    assert(!BenchGuard.maybeUpdateBest(dir, art(1.0, "/elsewhere/sf0.1"), 1.0,
      eligible = true, sf = "/elsewhere/sf0.1"),
      "two SF strings sharing a filename leaf must never clobber each other")
    assert(java.nio.file.Files.readString(
      dir.resolve(BenchGuard.bestArtifactNameFor("/d/sf0.1")))
      .contains("\"sf\":\"/d/sf0.1\""))
    assert(BenchGuard.maybeUpdateBest(dir, art(12.0, "/d/sf0.1"), 12.0,
      eligible = true, sf = "/d/sf0.1"), "a faster clean run replaces it")
    val Some(best) = BenchGuard.reference(dir, "value", "queries",
      sf = Some("/d/sf0.1"))
    assert(best.total == 12.0, s"reference() must see the standing best: $best")
    // the per-SF slot referees its own SF through reference()
    val Some(expBest) = BenchGuard.reference(dir, "value", "queries",
      sf = Some("/d/sf0.001"))
    assert(expBest.total == 2.0 &&
      expBest.artifact == BenchGuard.bestArtifactNameFor("/d/sf0.001"),
      s"the experiment SF referees against its own slot: $expBest")
  }

  test("action_rev methodology boundary: a rev upgrade RESETS the standing-" +
      "best slot (slower-but-honest replaces), a newer-rev slot is never " +
      "downgraded, and references read same-rev artifacts only") {
    val dir = java.nio.file.Files.createTempDirectory("bench-rev")
    val sf = "/d/sf0.1"
    def art(total: Double, rev: Int, sfv: String = sf) =
      s"""{"value":$total,"queries":{"a":$total},"failed":[],""" +
        (if (rev > 0) s""""action_rev":$rev,""" else "") + s""""sf":"$sfv"}"""
    val slot = dir.resolve(BenchGuard.bestArtifactNameFor(sf))
    // a rev-1 best (no field — every pre-r17 artifact) yields to a
    // SLOWER current-rev run: the forced action's numbers are larger by
    // construction, so the old total would otherwise stand forever
    java.nio.file.Files.write(slot, art(10.0, rev = 0).getBytes("UTF-8"))
    assert(BenchGuard.maybeUpdateBest(dir, art(25.0, BenchGuard.ActionRev), 25.0,
      eligible = true, sf = sf), "methodology upgrade must reset the slot")
    assert(java.nio.file.Files.readString(slot)
      .contains(s""""action_rev":${BenchGuard.ActionRev}"""))
    // once current-rev, the monotone rule applies again
    assert(!BenchGuard.maybeUpdateBest(dir, art(30.0, BenchGuard.ActionRev), 30.0,
      eligible = true, sf = sf), "same-rev slower run never replaces")
    // a FUTURE-rev slot vetoes this binary's runs outright
    java.nio.file.Files.write(slot,
      art(99.0, BenchGuard.ActionRev + 1).getBytes("UTF-8"))
    assert(!BenchGuard.maybeUpdateBest(dir, art(1.0, BenchGuard.ActionRev), 1.0,
      eligible = true, sf = sf), "an older-rev run never replaces a newer-rev best")
    // references: a rev-1 artifact is invisible to the current referee
    // (its count()-era per-query rows would read honest rev-2 times as
    // inflation), for the load maps too
    java.nio.file.Files.delete(slot)
    java.nio.file.Files.write(dir.resolve("BENCH_FULL_r20.json"),
      (s"""{"value":5.0,"queries":{"a":5.0},"failed":[],""" +
        s""""load_per_shape_qps":{"a":44.0},"sf":"$sf"}""").getBytes("UTF-8"))
    assert(BenchGuard.reference(dir, "value", "queries", sf = Some(sf)).isEmpty,
      "a rev-1 committed artifact must not referee rev-2 runs")
    assert(BenchGuard.loadReference(dir, "load_per_shape_qps", sf = Some(sf)).isEmpty,
      "rev-1 per-shape rates must not stand as load references")
  }

  test("bestArtifactNameFor sanitizes the SF leaf deterministically") {
    assert(BenchGuard.bestArtifactNameFor("/root/testdata/sf0.1")
      == "BENCH_BEST_sf0_1.json")
    assert(BenchGuard.bestArtifactNameFor("/tmp/graft-scale/n500000/")
      == "BENCH_BEST_n500000.json")
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

  test("focalMerge min-merges the retry round through the caller's ONE " +
      "timed action: a genuine regression (slow on both) still publishes, " +
      "a burst is repaired, a failed retry never lowers its row") {
    val base = Seq("regressed" -> 1.2, "burst" -> 1.2, "broken" -> 1.2, "clean" -> 0.3)
    val suspects = Seq(
      BenchGuard.Focal("regressed", 0.3, 1.2),
      BenchGuard.Focal("burst", 0.3, 1.2),
      BenchGuard.Focal("broken", 0.3, 1.2))
    val execs = scala.collection.mutable.ListBuffer.empty[String]
    val (merged, json) = BenchGuard.focalMerge(base, suspects, {
      case n @ "regressed" => execs += n; (1.19, true)
      case n @ "burst" => execs += n; (0.31, true)
      case n @ "broken" => execs += n; (0.05, false)
      case n => execs += n; (9.9, true)
    })
    val m = merged.toMap
    assert(m("regressed") == 1.19 && m("burst") == 0.31 && m("broken") == 1.2
      && m("clean") == 0.3)
    assert(execs.toSet == Set("regressed", "burst", "broken"),
      "only the suspects re-run, each exactly once")
    assert(json.contains("\"broken\":{\"ref\":0.300,\"first\":1.200,\"retry\":-1.000}"),
      s"a failed retry is disclosed as -1: $json")
    assert(BenchGuard.focalMerge(base, Seq.empty,
      n => fail(s"no suspects must mean no executions, got $n")) == (base, "{}"))
  }

  // ---- load/HTTP probe referee (r17, closing r16's only `weak`) -------

  test("loadSuspects inverts the comparison for rates: shapes serving " +
      ">1.5x UNDER the committed reference are suspect, LOWEST measured " +
      "q/s first (the min-over-shapes headline's binding order), bounded, " +
      "abstaining on thin or missing references") {
    val ref = Map("a" -> 44.1, "b" -> 13.6, "c" -> 20.0, "slowref" -> 0.5)
    // a: 4.43 vs 44.1 (the r16 http_drop_point shape), b: 2.32 vs 13.6
    // (be_jet_links_hash), c healthy, slowref has no signal
    val cur = Seq("a" -> 4.43, "b" -> 2.32, "c" -> 18.0, "slowref" -> 0.1, "new" -> 0.2)
    val sus = BenchGuard.loadSuspects(cur, ref)
    assert(sus.map(_.name) == Seq("b", "a"),
      s"measured-ascending order (2.32 then 4.43), healthy/thin/unknown skipped: $sus")
    assert(BenchGuard.loadSuspects(cur, Map.empty).isEmpty,
      "no reference: the referee abstains (the SPARK_GRAFT_LOAD_FOCAL=0 arm)")
    val many = (1 to 20).map(i => s"s$i" -> 1.0)
    val bigRef = (1 to 20).map(i => s"s$i" -> 30.0).toMap
    assert(BenchGuard.loadSuspects(many, bigRef).length == 8,
      "re-attack budget caps at maxRetries")
    // the headline-binding shape must make the cut even when its
    // ABSOLUTE deficit is the smallest on the board (the r17 ratchet
    // run published 8.49 q/s un-refereed exactly this way): 8 fast
    // shapes with huge deficits + the slow arg-min shape with a small
    // one — the slow shape ranks FIRST, not ninth
    val fast = (1 to 8).map(i => s"fast$i" -> 40.0)
    val mixedRef = (fast.map { case (n, _) => n -> 130.0 } :+ ("argmin" -> 13.6)).toMap
    val mixed = BenchGuard.loadSuspects(fast :+ ("argmin" -> 8.49), mixedRef)
    assert(mixed.head.name == "argmin" && mixed.length == 8,
      s"arg-min shape must take the first slot: $mixed")
  }

  test("parseShapeQps reads both emitter forms: the flat qps map and the " +
      "nested per-shape stats object (brace-matched, qps-first)") {
    val art =
      """{"load_per_shape_qps":{"be_a":44.1,"be_b":13.6},""" +
      """"load_http_per_shape":{"http_x":{"qps":29.51,"n":71,"p50_ms":246,""" +
      """"attempts":[{"qps":29.51,"load1_before":1.0}]},"http_y":{"qps":4.43,"n":9}},""" +
      """"other":{"nested":{"no_rate":1}}}"""
    assert(BenchGuard.parseShapeQps(art, "load_per_shape_qps")
      == Some(Map("be_a" -> 44.1, "be_b" -> 13.6)))
    assert(BenchGuard.parseShapeQps(art, "load_http_per_shape")
      == Some(Map("http_x" -> 29.51, "http_y" -> 4.43)),
      "nested attempts arrays must not terminate the object early")
    assert(BenchGuard.parseShapeQps(art, "other").isEmpty,
      "nested entries without a leading qps are an unknown shape: abstain")
    assert(BenchGuard.parseShapeQps(art, "missing").isEmpty)
  }

  test("loadReference takes the per-shape MAX across clean same-SF " +
      "artifacts — one artifact's contended shape row cannot depress the " +
      "reference, and a dirty or cross-SF artifact never contributes") {
    val dir = java.nio.file.Files.createTempDirectory("load-ref")
    def art(shapes: String, failed: String, sf: String) =
      s"""{"value":9.9,"load_per_shape_qps":$shapes,"failed":$failed,""" +
        s""""action_rev":${BenchGuard.ActionRev},"sf":"$sf"}"""
    java.nio.file.Files.write(dir.resolve("BENCH_FULL_r15.json"),
      art("""{"a":44.1,"b":2.3}""", "[]", "/d/sf0.1").getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("BENCH_FULL_r16.json"),
      art("""{"a":4.4,"b":13.6}""", "[]", "/d/sf0.1").getBytes("UTF-8"))
    // dirty artifact with huge rates must not inflate the reference
    java.nio.file.Files.write(dir.resolve("BENCH_FULL_r14.json"),
      art("""{"a":999.0,"b":999.0}""", """["x"]""", "/d/sf0.1").getBytes("UTF-8"))
    // other-SF artifact likewise
    java.nio.file.Files.write(dir.resolve(BenchGuard.BestArtifactName),
      art("""{"a":500.0}""", "[]", "/d/sf0.001").getBytes("UTF-8"))
    val ref = BenchGuard.loadReference(dir, "load_per_shape_qps", sf = Some("/d/sf0.1"))
    assert(ref == Map("a" -> 44.1, "b" -> 13.6), s"per-shape max of the clean rows: $ref")
    assert(BenchGuard.loadReference(dir, "nope", sf = Some("/d/sf0.1")).isEmpty)
  }

  test("refereedShapes: deferred gate retries, then the focal referee " +
      "round — a burst-swept shape recovers and publishes its max, a " +
      "genuine serving regression is slow on every window and still " +
      "publishes, a healthy shape attacks exactly once") {
    val calls = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val script = Map(
      "fast" -> Seq(30.0),
      "burst" -> Seq(2.0, 3.0, 2.5, 38.0),
      "regressed" -> Seq(2.0, 2.1, 2.2, 2.3))
    def attack(name: String): LoadProbe.ShapeAttempt = {
      val i = calls(name); calls(name) = i + 1
      val qps = script(name).lift(i).getOrElse(script(name).last)
      LoadProbe.ShapeAttempt(LoadProbe.AttackStats(qps, 10, 1, 2, 3), 0.5, 0.6)
    }
    val ref = Map("fast" -> 33.0, "burst" -> 40.0, "regressed" -> 14.0)
    var settled = 0
    val (rs, focal) = LoadProbe.refereedShapes(
      Seq("fast", "burst", "regressed"), attack, ref, () => settled += 1)
    val byName = rs.map(r => r.name -> r).toMap
    assert(byName("fast").attempts.length == 1 && !byName("fast").refereed)
    assert(byName("burst").attempts.length == 4 && byName("burst").refereed)
    assert(byName("burst").best.stats.qps == 38.0, "the referee retry publishes")
    assert(byName("regressed").attempts.length == 4)
    assert(byName("regressed").best.stats.qps == 2.3,
      "slow on all four windows: the regression publishes")
    assert(settled == 1, "load settles ONCE before the referee round, not per shape")
    assert(focal.contains("\"burst\"") && focal.contains("\"regressed\"")
      && !focal.contains("\"fast\""), s"disclosure names the refereed shapes: $focal")
    // disclosure semantics (review r17): `first` is literally attempt 1
    // (matching the first-attempt floors), `pre` the gate-round best the
    // suspect criterion used
    assert(focal.contains("\"burst\":{\"ref\":40.00,\"first\":2.00,\"pre\":3.00,\"retry\":38.00}"),
      s"first=attempt1, pre=gate-round best: $focal")
    // no reference: gate rounds still run, referee abstains, no settling
    calls.clear()
    val (rs2, focal2) = LoadProbe.refereedShapes(
      Seq("regressed"), attack, Map.empty, () => fail("must not settle"))
    assert(rs2.head.attempts.length == 3 && focal2 == "{}")
  }

  test("reference picks the best error-free committed artifact among the " +
      "newest three — one contended committed round cannot poison it") {
    val dir = java.nio.file.Files.createTempDirectory("bench-guard")
    def write(r: Int, total: Double, failed: String): Unit =
      java.nio.file.Files.write(dir.resolve(s"BENCH_FULL_r$r.json"),
        (s"""{"value":$total,"queries":{"a":${total / 2},"b":${total / 2}},""" +
          s""""failed":$failed,"action_rev":${BenchGuard.ActionRev}}""").getBytes("UTF-8"))
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
      (s"""{"value":2.0,"queries":{"a":1.0,"b":1.0},"failed":[],""" +
        s""""action_rev":${BenchGuard.ActionRev},"sf":"/d/sf0.001"}""").getBytes("UTF-8"))
    val ref3 = BenchGuard.reference(dir, "value", "queries", sf = Some("/d/sf0.1"))
    assert(ref3.isEmpty, s"newest-3 window holds r15/r14/r13; only the " +
      s"sf-matched may referee and none of those three are: $ref3")
    assert(BenchGuard.reference(
      java.nio.file.Files.createTempDirectory("bench-guard-empty"),
      "value", "queries").isEmpty)
  }
}
