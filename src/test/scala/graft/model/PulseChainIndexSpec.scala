package graft.model

import graft.SparkSpec

/** Unit pins for the driver-held pulse-chain index — the structure every
  * serving endpoint now asks its chain point questions of (exists /
  * stored prev / `updateNextPulse` successor / `GetNextSavedPulse`).
  * Built here directly from a synthetic chain with gaps, a
  * non-arithmetic stored prev, and a contested successor, so each
  * lookup's edge semantics is pinned independently of any corpus.
  */
class PulseChainIndexSpec extends SparkSpec {

  /** Chain under test (pulse -> stored prev):
    *   100 -> 99   (stored prev does not exist: chain head)
    *   101 -> 100
    *   105 -> 101  (gap 102-104; non-arithmetic but real prev)
    *   106 -> 105
    *   108 -> 105  (second pulse claiming prev=105: successor contest)
    */
  private val pairs = Seq(
    (100L, 99L), (101L, 100L), (105L, 101L), (106L, 105L), (108L, 105L))

  private val index: Domain.PulseChainIndex = {
    val byPulse = pairs.sortBy(_._1)
    val byPrev = pairs.sortBy(p => (p._2, p._1))
    new Domain.PulseChainIndex(
      byPulse.map(_._1).toArray, byPulse.map(_._2).toArray,
      byPrev.map(_._2).toArray, byPrev.map(_._1).toArray)
  }

  test("exists: membership over the saved set only") {
    assert(index.exists(100L) && index.exists(105L) && index.exists(108L))
    assert(!index.exists(99L), "a stored prev is not existence")
    assert(!index.exists(102L) && !index.exists(104L), "gap pulses are absent")
    assert(!index.exists(109L))
  }

  test("storedPrev: raw stored value, None for an absent pulse") {
    assert(index.storedPrev(100L).contains(99L),
      "the stored prev is returned raw even when that pulse does not exist " +
        "(existence repair is the caller's step, like updatePrevPulse)")
    assert(index.storedPrev(105L).contains(101L), "non-arithmetic prevs survive")
    assert(index.storedPrev(103L).isEmpty)
  }

  test("nextByPrev: smallest pulse whose stored prev points here (updateNextPulse's First)") {
    assert(index.nextByPrev(105L).contains(106L),
      "two pulses claim prev=105; First in pulse order wins (106, not 108)")
    assert(index.nextByPrev(101L).contains(105L), "successor links jump the gap")
    assert(index.nextByPrev(106L).isEmpty, "no successor saved yet")
    assert(index.nextByPrev(99L).contains(100L))
  }

  test("nextSavedAfter: smallest saved pulse strictly greater (GetNextSavedPulse)") {
    assert(index.nextSavedAfter(101L).contains(105L), "jumps the 102-104 gap")
    assert(index.nextSavedAfter(100L).contains(101L))
    assert(index.nextSavedAfter(106L).contains(108L), "107 is not saved")
    assert(index.nextSavedAfter(108L).isEmpty, "nothing after the chain tip")
    assert(index.nextSavedAfter(1L).contains(100L), "before the head: the head")
  }

  test("corpus-built index agrees with the pulses spine row set") {
    val dir = "/root/testdata/sf0.001"
    val idx = Domain.pulseChainIndex(spark, dir)
    val rows = Domain.servedPulses(spark, dir)
      .select("pulse_number", "prev_pulse_number").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(idx.size == rows.length)
    rows.foreach { case (pn, prev) =>
      assert(idx.exists(pn))
      assert(idx.storedPrev(pn).contains(prev), s"storedPrev($pn)")
    }
    // spot-check the successor probe against a direct computation
    val byPrev = rows.groupBy(_._2).map { case (k, g) => k -> g.map(_._1).min }
    rows.take(50).foreach { case (pn, _) =>
      assert(idx.nextByPrev(pn) == byPrev.get(pn), s"nextByPrev($pn)")
    }
  }

  test("page algebra: countInRange/pageSlice match a brute-force model " +
      "over 300 random (index, bounds, order, offset/limit) draws — " +
      "hostile offsets included") {
    for (seed <- 0 until 300) {
      val rnd = new scala.util.Random(seed)
      val n = rnd.nextInt(40) // includes the empty index
      val pulses = Seq.fill(n)(rnd.between(0L, 2000L)).distinct.sorted
      val idx = {
        val pairs = pulses.map(p => (p, p - 1))
        val byPrev = pairs.sortBy(q => (q._2, q._1))
        new Domain.PulseChainIndex(
          pairs.map(_._1).toArray, pairs.map(_._2).toArray,
          byPrev.map(_._2).toArray, byPrev.map(_._1).toArray)
      }
      def bound() = rnd.nextInt(4) match {
        case 0 => None
        case 1 => Some(rnd.between(0L, 2000L))
        case 2 => Some(Long.MinValue)
        case _ => Some(Long.MaxValue)
      }
      val (gte, lte) = (bound(), bound())
      val asc = rnd.nextBoolean()
      val offset = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => rnd.nextInt(50)
        case 2 => Int.MaxValue // hostile: must fall out empty, never wrap
        case _ => Int.MaxValue - rnd.nextInt(3)
      }
      val limit = 1 + rnd.nextInt(25)
      val window = pulses.filter(p => gte.forall(p >= _) && lte.forall(p <= _))
      val ordered = if (asc) window else window.reverse
      val modelPage = ordered.drop(offset).take(limit).sorted // drop clamps
      val got = idx.pageSlice(gte, lte, asc, offset, limit).toSeq
      assert(idx.countInRange(gte, lte) == window.length.toLong,
        s"seed=$seed count (gte=$gte lte=$lte n=$n)")
      assert(got == modelPage,
        s"seed=$seed page: got $got want $modelPage " +
          s"(gte=$gte lte=$lte asc=$asc offset=$offset limit=$limit pulses=$pulses)")
    }
  }
}
