package graft

import scala.jdk.CollectionConverters._

/** Contention-outlier rejection for the bench instrument.
  *
  * Round 13 shipped a gate artifact whose cold total read 55 s on code
  * that three sibling runs (including a clean re-run the same evening)
  * measured at ~18 s: a host-contention burst swept the whole catalog
  * pass and the instrument — which already ANNOTATES per-pass load1 —
  * still PUBLISHED the contended number as the round's headline. The
  * missing piece was a referee: something that knows what this code
  * usually measures and refuses to publish a pass that contradicts it
  * with the contention signature.
  *
  * The signature is UNIFORMITY. Host contention inflates (nearly) every
  * query by a similar factor — CPU stolen from the whole process — while
  * a genuine regression concentrates in the queries whose plan or data
  * changed (r13's own real movers: mm_features 4.5× from real decode,
  * everything else flat). So a pass is rejected as contended only when
  * BOTH hold against the committed per-query history:
  *
  *   - the pass total exceeds `totalFactor` × the reference total, AND
  *   - at least `minFrac` of the comparable queries (reference time ≥
  *     `minRefSec` — sub-50 ms rows are pure noise) inflated by more
  *     than `queryFactor`.
  *
  * A real regression in a few queries fails the second clause and is
  * published; a config-style regression that uniformly slows everything
  * IS flagged, but the bounded re-runs then reproduce it, retries
  * exhaust, and the best (still slow) pass publishes with
  * `contended_unresolved` — a real slowdown can delay the verdict one
  * re-run, never hide.
  *
  * The reference comes from the committed `BENCH_FULL_r*.json`
  * artifacts (the lossless per-round copies): the newest three rounds
  * are parsed and the best error-free total wins, so one contended
  * COMMITTED artifact (r13's very defect) cannot poison the referee.
  */
object BenchGuard {

  /** The legacy standing best-clean-artifact file (see [[reference]]).
    * Kept as the GATE SF's slot: the judge and the round notes refer to
    * it by name, and every committed round so far seeded it at the gate
    * SF. Other SFs get their own [[bestArtifactNameFor]] slot.
    */
  val BestArtifactName = "BENCH_BEST.json"

  /** Per-SF standing-best file name: `BENCH_BEST_<leaf>.json` where
    * `<leaf>` is the SF dir's last path segment, non-alphanumerics
    * mapped to `_` (e.g. `/root/testdata/sf0.1` → `BENCH_BEST_sf0_1
    * .json`). One best per SF (ADVICE r16): the legacy single file was
    * SF-scoped only by REJECTION, so the first full-methodology run at
    * an experiment SF would have permanently locked the gate SF out of
    * ever establishing its standing best.
    */
  def bestArtifactNameFor(sf: String): String = {
    val leaf = sf.replaceAll("/+$", "").split('/').lastOption.getOrElse(sf)
    "BENCH_BEST_" + leaf.map(c => if (c.isLetterOrDigit) c else '_') + ".json"
  }

  /** Timing-methodology revision, stamped into every artifact as
    * `"action_rev"`. Bumped when WHAT THE TIMED REGION EXECUTES changes
    * so that cross-methodology numbers are never compared: rev 2 (r17)
    * routes the 12 catalog rows whose work `count()` let Catalyst prune
    * ([[Queries.ForcedActionRows]]) through the forced-materialization
    * action — their honest numbers are LARGER than every committed
    * rev-1 artifact's, so rev-1 references would flag them as suspects
    * forever and a rev-1 standing best would never be beaten. Rev 3
    * (r18) removes the r17 dir-keyed centroid and probe-vector memos:
    * emb_kmeans/dd_semdedup/dd_semdedup_fixed now run their Lloyd scans
    * inside the timed region every construction (the r17 verdict flagged
    * the memoed form as bench accounting) and the ann_* rows re-read
    * their probe vector per construction — rev-2 numbers for those rows
    * are smaller by construction and must not referee rev-3 passes.
    * Artifacts without the field are rev 1. Policy:
    * [[reference]]/[[loadReference]] only read same-rev artifacts, and
    * the standing-best slot RESETS on a rev upgrade (a newer-rev clean
    * eligible run replaces regardless of totals; an older-rev run never
    * replaces a newer-rev best).
    */
  val ActionRev = 3

  /** The artifact's stamped methodology revision (absent = rev 1). */
  def artifactRev(json: String): Int = {
    val m = "\"action_rev\":\\s*(\\d+)".r.findFirstMatchIn(json)
    m.map(_.group(1).toInt).getOrElse(1)
  }

  /** A committed pass to compare against: total + per-query seconds. */
  final case class PassRef(total: Double, perQuery: Map[String, Double], artifact: String)

  /** Verdict on one standing-best file for a run measuring `total` at
    * `sf`: may this run overwrite it, and does it veto the update?
    *
    *  - same sf, strictly slower record → replace;
    *  - same sf, not strictly slower → VETO (monotone invariant);
    *  - ANOTHER sf's readable record → never replace, and in the
    *    per-SF slot it also vetoes: two distinct SF strings can share a
    *    filename leaf (`/a/sf0.1` vs `/b/sf0.1`, or a trailing slash),
    *    and silently clobbering someone else's baseline is exactly the
    *    failure this file exists to prevent (review r17 — the first
    *    rewrite dropped the old code's other-SF rejection);
    *  - unreadable file → replace (damage yields to a clean run), no
    *    veto.
    */
  private sealed trait SlotVerdict
  private case object Replace extends SlotVerdict
  private case object Keep extends SlotVerdict
  private case object Veto extends SlotVerdict

  private def slotVerdict(content: String, total: Double, sf: String,
      otherSfVetoes: Boolean): SlotVerdict =
    if (content.contains(s""""sf":"$sf""""))
      // methodology boundary first: an upgrade RESETS the slot (rev-1
      // totals are not comparable to rev-2 ones — the forced action's
      // honest numbers are larger by construction), and a downgraded
      // run never replaces a newer-rev best
      if (artifactRev(content) < ActionRev) Replace
      else if (artifactRev(content) > ActionRev) Veto
      else if (parsePass(content, "value", "queries").forall(total < _._1)) Replace else Veto
    else if (otherSfVetoes) Veto
    else Keep

  /** Atomic artifact write: temp file in the same dir + ATOMIC_MOVE
    * (the `_frontier.json` pattern — ADVICE r16: a crash mid-write with
    * plain truncate-then-write leaves a file that either loses the
    * monotone invariant via the parse-failure branch or, missing its
    * `sf` field, permanently blocks all updates).
    */
  private def writeAtomically(target: java.nio.file.Path, json: String): Unit = {
    val tmp = java.nio.file.Files.createTempFile(target.getParent, target.getFileName.toString, ".tmp")
    try {
      java.nio.file.Files.write(tmp, json.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally {
      // no-op after a successful move; prevents .tmp orphans piling up
      // in the repo root on failed attempts (review r17)
      java.nio.file.Files.deleteIfExists(tmp)
      ()
    }
  }

  /** Replace this SF's standing-best artifact with this run's when the
    * run is eligible (error-free, no unresolved contention verdict) and
    * STRICTLY faster than the standing best at the same SF — monotone
    * improvement, so no amount of host contention can degrade the
    * baseline future passes referee against. A code change that
    * legitimately slows the engine leaves the old best standing; the
    * per-query referee then retries the slowed rows once and publishes
    * their (still slow) minimum — a real regression is delayed one
    * duplicate execution of ≤ [[focalSuspects]]'s retry cap, never
    * hidden.
    *
    * Two slots are maintained: the per-SF file ([[bestArtifactNameFor]])
    * is written for every sf (vetoed if its filename already holds a
    * DIFFERENT sf's record — two SF strings can share a leaf), and the
    * legacy [[BestArtifactName]] is additionally refreshed only while
    * it RECORDS this sf — so the gate SF's known-by-name file stays
    * current while an experiment SF seeds its own slot instead of being
    * rejected against (or claiming) someone else's baseline (the r16
    * ADVICE lockout and its mirror image). Returns true when at least
    * one slot was replaced.
    */
  def maybeUpdateBest(dir: java.nio.file.Path, json: String, total: Double,
      eligible: Boolean, sf: String): Boolean = {
    if (!eligible || total <= 0) return false
    def read(p: java.nio.file.Path): Option[Option[String]] =
      if (!java.nio.file.Files.isRegularFile(p)) None
      else Some(try Some(java.nio.file.Files.readString(p)) catch { case _: Throwable => None })
    val perSf = dir.resolve(bestArtifactNameFor(sf))
    val legacy = dir.resolve(BestArtifactName)
    // Per-SF slot: another SF's record in OUR filename (leaf collision,
    // e.g. trailing slash or a second tree whose dir shares the leaf)
    // VETOES — never clobber someone else's baseline. An absent file or
    // unreadable damage yields to a clean run.
    val perSfVerdict = read(perSf) match {
      case None => Replace // absent: seed
      case Some(None) => Replace // unreadable damage: yield to a clean run
      case Some(Some(s)) => slotVerdict(s, total, sf, otherSfVetoes = true)
    }
    // Legacy slot: refreshed only while it RECORDS this sf — an absent
    // or other-SF legacy is left alone (review r17: letting the first
    // eligible run of ANY sf claim a vacant legacy file is the mirror
    // image of the r16 lockout; the per-SF slots are authoritative, the
    // legacy file persists in git for its recorded sf). A same-sf
    // legacy that is FASTER than this run vetoes the whole update.
    val legacyContent = read(legacy)
    val legacyVerdict = legacyContent match {
      case None => Keep // vacant: per-SF slots carry the baseline
      case Some(None) => Keep // unreadable: unknown owner, leave alone
      case Some(Some(s)) => slotVerdict(s, total, sf, otherSfVetoes = false)
    }
    if (perSfVerdict == Veto || legacyVerdict == Veto) false
    else {
      // each slot's write failure is its own: a legacy-slot IO error
      // must not suppress the true "per-SF slot replaced" report
      // (review r17 — the documented contract is "true when at least
      // one slot was replaced")
      def tryWrite(p: java.nio.file.Path): Boolean =
        try { writeAtomically(p, json); true } catch { case _: Throwable => false }
      val wrotePerSf = tryWrite(perSf)
      val wroteLegacy = legacyVerdict == Replace && tryWrite(legacy)
      wrotePerSf || wroteLegacy
    }
  }

  /** Verdict of one comparison. `compared` is how many queries were
    * eligible — below `minCompared` the detector abstains (a reshaped
    * catalog must not trip on name churn).
    */
  final case class Signature(contended: Boolean, totalRatio: Double,
      inflatedFrac: Double, compared: Int)

  val NoSignature: Signature = Signature(contended = false, -1.0, -1.0, 0)

  /** One per-query focal suspect: a row the committed reference says
    * should be fast, measured inflated this pass.
    */
  final case class Focal(name: String, refSec: Double, firstSec: Double)

  /** FOCAL-contention suspects of `cur` against `ref` — the blind spot
    * of [[signature]]'s uniform detector, measured in the r15 gate
    * artifact: a loaded box (load1 11) inflated a MINORITY of rows
    * (ann_* 2–3× on 0.1–0.4 s bases, `inflated_frac` 0.14), so the
    * whole-pass referee correctly did not trip, yet the headline total
    * moved 14.3 → 23.9 s on pure sub-second-row noise. The per-query
    * referee names exactly those rows: reference time ≥ `minRefSec`
    * (sub-50 ms rows are noise both ways) and this pass's time more
    * than `queryFactor` over it. The caller re-runs each suspect once
    * and keeps the per-query MIN — a genuinely regressed query is slow
    * on both attempts, so the min still publishes the regression, while
    * a burst must land on the same row twice to survive.
    *
    * Bounded at `maxRetries`, slowest absolute inflation first, so the
    * retry budget binds on seconds recoverable — and so a pass inflated
    * almost everywhere (which the uniform detector owns) cannot turn
    * this into a full second pass.
    */
  def focalSuspects(
      cur: Seq[(String, Double)],
      ref: PassRef,
      minRefSec: Double = 0.05,
      queryFactor: Double = 1.5,
      maxRetries: Int = 16): Seq[Focal] =
    cur.flatMap { case (n, t) =>
      ref.perQuery.get(n)
        .filter(r => r >= minRefSec && t > r * queryFactor)
        .map(r => Focal(n, r, t))
    }.sortBy(f => -(f.firstSec - f.refSec)).take(maxRetries)

  /** Min-merge of one focal retry round over `base`: each suspect
    * re-runs once via `exec` and the published per-query number is the
    * MIN of the two executions (a genuine regression is slow on both
    * and still publishes; a burst must land on the same row twice to
    * survive). `exec` must be the SAME timed action the measured pass
    * used — the bench passes its one `timedRun` helper, so the retry is
    * like-for-like by construction. Returns the merged pass plus the
    * disclosure JSON (every retried row's (ref, first, retry); a failed
    * retry reads -1 and never lowers its row).
    */
  def focalMerge(base: Seq[(String, Double)], suspects: Seq[Focal],
      exec: String => (Double, Boolean)): (Seq[(String, Double)], String) = {
    if (suspects.isEmpty) (base, "{}")
    else {
      val retried = suspects.map { f =>
        val (sec, ok) = exec(f.name)
        (f, if (ok) sec else Double.MaxValue)
      }
      val bySec = retried.map { case (f, s) => f.name -> s }.toMap
      val merged = base.map { case (n, t) => n -> math.min(t, bySec.getOrElse(n, t)) }
      val json = retried.map { case (f, s) =>
        f""""${f.name}":{"ref":${f.refSec}%.3f,"first":${f.firstSec}%.3f""" +
          f""","retry":${if (s == Double.MaxValue) -1.0 else s}%.3f}"""
      }.mkString("{", ",", "}")
      (merged, json)
    }
  }

  // ---- load/HTTP probe referee ---------------------------------------
  //
  // The serving-throughput axis of the exact blind spot the per-query
  // focal referee closed for the catalog passes (r16's only `weak`): the
  // r16 gate artifact published `load_http_min_qps` 4.43 (< the 5 rps
  // baseline analog) and `be_jet_links_hash` 2.32 q/s while the
  // same-code clean artifact measured those shapes at 44.1 and 13.6 —
  // a contended window publishing a 6–10× serving "regression" the code
  // never had, with no committed-reference comparison, no retry-and-
  // publish-best, and no disclosure. These helpers are `focalSuspects`
  // with the comparison INVERTED (q/s is a rate — bigger is better):
  // the caller re-attacks each suspect shape once after load settles and
  // publishes the per-shape MAX, keeping the first attempt in the
  // artifact. A genuine serving regression is slow on both attacks, so
  // the max still publishes it; a burst must sweep the same shape's
  // both windows to survive.

  /** One per-shape load suspect: a shape the committed reference says
    * this code serves fast, measured slow this window.
    */
  final case class LoadFocal(name: String, refQps: Double, firstQps: Double)

  /** Suspect shapes of `cur` (shape → measured q/s) against `ref`
    * (shape → best committed q/s): reference at least `minRefQps` (a
    * shape the reference itself served slowly carries no signal either
    * way) and this window's rate more than `factor` under it. Bounded
    * at `maxRetries`, LOWEST measured q/s first: the published headline
    * is min-over-shapes, so the binding shapes are the slowest-measured
    * ones — an absolute-deficit order (right for the query bench, whose
    * headline is a SUM) would spend the whole budget on fast shapes
    * whose retries cannot move a min pinned by a slow one (r17 ratchet
    * run: be_jet_links_hash at 8.49 vs ref 13.6 set the headline but
    * ranked 9th by deficit and went un-refereed while 129.8→40.7-class
    * shapes took all 8 slots).
    */
  def loadSuspects(cur: Seq[(String, Double)], ref: Map[String, Double],
      minRefQps: Double = 1.0, factor: Double = 1.5,
      maxRetries: Int = 8): Seq[LoadFocal] =
    cur.flatMap { case (n, q) =>
      ref.get(n).filter(r => r >= minRefQps && q * factor < r)
        .map(r => LoadFocal(n, r, q))
    }.sortBy(_.firstQps).take(maxRetries)

  /** Extract a per-shape q/s map from a bench artifact's `field` object.
    * Hand-rolled for exactly the two shapes this repo's Bench emits
    * (same discipline as [[parsePass]]): the FLAT form
    * `{"shape":43.8,...}` (`load_per_shape_qps`) and the NESTED form
    * `{"shape":{"qps":29.51,...},...}` (`load_http_per_shape`,
    * `load_shape_stats` — the emitters always put `qps` first in the
    * per-shape object). The object is brace-matched (nested entries mean
    * the first `}` does NOT close it); nested `"qps"` entries win when
    * present, else the body must be flat. Any shape surprise reads as
    * None — the referee abstains, never guesses.
    */
  def parseShapeQps(json: String, field: String): Option[Map[String, Double]] = {
    val open = json.indexOf("\"" + field + "\":{")
    if (open < 0) return None
    val start = json.indexOf('{', open)
    var depth = 0
    var i = start
    var end = -1
    while (i < json.length && end < 0) {
      json.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end < 0) return None
    val body = json.substring(start + 1, end)
    val num = "(-?[0-9][0-9.eE+-]*)"
    val nested = ("\"([A-Za-z0-9_]+)\":\\{\"qps\":" + num).r
    val nestedPairs = nested.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
    if (nestedPairs.nonEmpty) Some(nestedPairs)
    else if (body.contains("{")) None // nested entries without a leading qps: unknown shape
    else {
      val flat = ("\"([A-Za-z0-9_]+)\":" + num).r
      val pairs = flat.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
      if (pairs.isEmpty) None else Some(pairs)
    }
  }

  /** Per-shape reference rates for the load referee: the MAX q/s each
    * shape has measured across the eligible committed artifacts (the
    * newest three `BENCH_FULL_r*` plus the standing per-SF best), clean
    * (`failed:[]`) and same-SF only. Max, not best-artifact, because
    * the best is selected by CATALOG total — the r16 standing best was
    * recorded under measured 10.8% hypervisor steal and its own HTTP
    * windows ran at load1 ~10, so any single artifact can carry a few
    * contended shape rows; the per-shape max across several runs is the
    * honest "this code has served this shape at X" claim. An inflated
    * reference costs at most one extra re-attack — publishing still
    * takes OUR measured max. Empty map when nothing qualifies (the
    * referee then abstains for the whole section).
    */
  def loadReference(dir: java.nio.file.Path, field: String,
      sf: Option[String] = None): Map[String, Double] = {
    val roundRe = "BENCH_FULL_r(\\d+)\\.json".r
    val files =
      try {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.flatMap { p =>
          roundRe.findFirstMatchIn(p.getFileName.toString).map(m => (m.group(1).toInt, p))
        }.toVector.sortBy(-_._1).take(3).map(_._2)
        finally s.close()
      } catch { case _: Throwable => Vector.empty }
    val best = Seq(Some(BestArtifactName), sf.map(bestArtifactNameFor)).flatten
      .distinct.map(dir.resolve).filter(java.nio.file.Files.isRegularFile(_))
    (files ++ best).flatMap { p =>
      try {
        val json = java.nio.file.Files.readString(p)
        val sfOk = sf.forall(want => json.contains(s""""sf":"$want""""))
        // same-methodology only: dd_incremental is both a forced row
        // and a load shape — a rev-1 artifact's count()-fast q/s would
        // stand as its per-shape MAX forever and flag every honest
        // rev-2 attack as a suspect
        if (!sfOk || !cleanFailed(json) || artifactRev(json) != ActionRev) None
        else parseShapeQps(json, field)
      } catch { case _: Throwable => None }
    }.flatten.groupMapReduce(_._1)(_._2)(math.max)
  }

  /** Best (smallest positive) committed value of a scalar lower-is-
    * better field — e.g. `ingest_daemon_per_pulse_sec` — across the
    * newest three `BENCH_FULL_r*` plus the standing bests, clean
    * (`failed:[]`), same-SF, same-rev only. The daemon referee reads it
    * (r17 verdict task 4: the daemon section was the one gate with no
    * committed-reference retry — a contended window published
    * 8.18 s/pulse against a 1.47–3.46 s committed record with nothing
    * re-checking it). None when nothing qualifies — the referee then
    * abstains, never guesses.
    */
  def scalarReference(dir: java.nio.file.Path, field: String,
      sf: Option[String] = None): Option[Double] = {
    val roundRe = "BENCH_FULL_r(\\d+)\\.json".r
    val files =
      try {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.flatMap { p =>
          roundRe.findFirstMatchIn(p.getFileName.toString).map(m => (m.group(1).toInt, p))
        }.toVector.sortBy(-_._1).take(3).map(_._2)
        finally s.close()
      } catch { case _: Throwable => Vector.empty }
    val best = Seq(Some(BestArtifactName), sf.map(bestArtifactNameFor)).flatten
      .distinct.map(dir.resolve).filter(java.nio.file.Files.isRegularFile(_))
    val re = ("\"" + java.util.regex.Pattern.quote(field) +
      "\":(-?[0-9][0-9.eE+-]*)").r
    (files ++ best).flatMap { p =>
      try {
        val json = java.nio.file.Files.readString(p)
        val sfOk = sf.forall(want => json.contains(s""""sf":"$want""""))
        if (!sfOk || !cleanFailed(json) || artifactRev(json) != ActionRev) None
        else re.findFirstMatchIn(json).map(_.group(1).toDouble).filter(_ > 0)
      } catch { case _: Throwable => None }
    }.minOption
  }

  /** Uniform-inflation test of `cur` against `ref` (see object doc). */
  def signature(
      cur: Seq[(String, Double)],
      ref: PassRef,
      minRefSec: Double = 0.05,
      totalFactor: Double = 1.5,
      queryFactor: Double = 1.5,
      minFrac: Double = 0.8,
      minCompared: Int = 10): Signature = {
    val ratios = cur.flatMap { case (n, t) =>
      ref.perQuery.get(n).filter(_ >= minRefSec).map(t / _)
    }
    if (ref.total <= 0 || ratios.length < minCompared) NoSignature
    else {
      val curTotal = cur.map(_._2).sum
      val totalRatio = curTotal / ref.total
      val inflatedFrac = ratios.count(_ > queryFactor).toDouble / ratios.length
      Signature(totalRatio > totalFactor && inflatedFrac >= minFrac,
        totalRatio, inflatedFrac, ratios.length)
    }
  }

  /** Extract `"field":<number>` and the flat `"queriesField":{...}` map
    * from a bench artifact. Hand-rolled for exactly the JSON this repo's
    * Bench emits (flat string→number maps, no escapes); any shape
    * surprise reads as None — the referee abstains, never guesses.
    */
  def parsePass(json: String, totalField: String, queriesField: String): Option[(Double, Map[String, Double])] = {
    val totalRe = ("\"" + java.util.regex.Pattern.quote(totalField) +
      "\":(-?[0-9][0-9.eE+-]*)").r
    val total = totalRe.findFirstMatchIn(json).map(_.group(1).toDouble)
    val open = json.indexOf("\"" + queriesField + "\":{")
    val body = if (open < 0) None else {
      val start = json.indexOf('{', open)
      val close = json.indexOf('}', start) // flat map: first '}' closes it
      if (close < 0) None else Some(json.substring(start + 1, close))
    }
    for (t <- total; b <- body) yield {
      val pairRe = "\"([A-Za-z0-9_]+)\":(-?[0-9][0-9.eE+-]*)".r
      (t, pairRe.findAllMatchIn(b).map(m => m.group(1) -> m.group(2).toDouble).toMap)
    }
  }

  /** True when the artifact's `failed` list is empty (a pass in which a
    * query errored has an artificially small total and must not referee).
    */
  def cleanFailed(json: String): Boolean = json.contains("\"failed\":[]")

  /** The reference pass for `totalField`/`queriesField`, from the newest
    * three committed `BENCH_FULL_r*.json` under `dir` plus the standing
    * `BENCH_BEST.json` (the best clean artifact this code has ever
    * measured — maintained by the bench itself, replaced only by a
    * strictly faster error-free uncontended run, so a contended gate
    * run can never poison it AND can never evict the clean baseline the
    * way it evicts its round's `BENCH_FULL_r*` slot: r15's clean
    * 14.3 s artifact was overwritten in the working tree by the
    * driver's 23.9 s load1-11 run, leaving the newest-3 window with no
    * clean row under 21 s to referee against). Error-free artifacts
    * preferred, smallest total wins (a contended committed artifact
    * loses to any clean sibling). Only artifacts measured at
    * the SAME scale factor referee (`sf` — a 10x-bigger SF inflates
    * every query uniformly, exactly the signature, so a cross-SF
    * comparison would reject every legitimate scale run). None when no
    * artifact qualifies — the detector then abstains for the whole run.
    */
  def reference(dir: java.nio.file.Path, totalField: String,
      queriesField: String, sf: Option[String] = None): Option[PassRef] = {
    val roundRe = "BENCH_FULL_r(\\d+)\\.json".r
    val files =
      try {
        val s = java.nio.file.Files.list(dir)
        try s.iterator().asScala.flatMap { p =>
          roundRe.findFirstMatchIn(p.getFileName.toString).map(m => (m.group(1).toInt, p))
        }.toVector.sortBy(-_._1).take(3)
        finally s.close()
      } catch { case _: Throwable => Vector.empty }
    val best = Seq(Some(BestArtifactName), sf.map(bestArtifactNameFor)).flatten
      .distinct.map(dir.resolve)
      .filter(java.nio.file.Files.isRegularFile(_))
      .map((Int.MaxValue, _)).toVector
    val parsed = (files ++ best).flatMap { case (_, p) =>
      try {
        val json = java.nio.file.Files.readString(p)
        val sfOk = sf.forall(want => json.contains(s""""sf":"$want""""))
        // same-methodology artifacts only: a rev-1 reference would
        // read the forced rows' honest rev-2 times as inflation
        if (!sfOk || artifactRev(json) != ActionRev) None
        else parsePass(json, totalField, queriesField).map { case (t, qs) =>
          (PassRef(t, qs, p.getFileName.toString), cleanFailed(json))
        }
      } catch { case _: Throwable => None }
    }
    val eligible = {
      val clean = parsed.filter(_._2)
      if (clean.nonEmpty) clean else parsed
    }
    eligible.map(_._1).filter(_.total > 0).minByOption(_.total)
  }
}
