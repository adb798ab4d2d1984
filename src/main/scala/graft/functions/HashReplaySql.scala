package graft.functions

import scala.collection.mutable.ListBuffer

/** Generates DuckDB SQL that replays the engine's 64-bit hash kernels
  * bit-for-bit — the machinery that turns "seeded hash families are not
  * SQL-expressible" into exact oracles for the MinHash family.
  *
  * DuckDB's integer arithmetic is CHECKED (overflow errors), not
  * wrapping, so every Java wrapping op is emulated: state rides UBIGINT,
  * multiplies split into 32-bit halves (a full 64×64 product overflows
  * even INT128), rotates go mask-then-widen-multiply, and the final value
  * maps back to two's-complement BIGINT where the Spark side compares
  * signed (MIN of a signature slot).
  *
  * Expression growth is the other trap: naive nesting duplicates the
  * upstream tree ~4× per multiply (measured: minutes for 26k rows), and
  * DuckDB 1.x lateral column aliases re-expand textually, so they don't
  * help. [[CteChain]] therefore emits one MATERIALIZED CTE per primitive:
  * every input is a real column, multi-references are O(1), and the whole
  * replay runs in seconds.
  */
private[graft] object HashReplaySql {

  private val M64 = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  private val S63 = "CAST('9223372036854775808' AS UBIGINT)"  // 2^63

  private def u(lit: Long): String =
    s"CAST('${java.lang.Long.toUnsignedString(lit)}' AS UBIGINT)"

  private def toSigned(a: String): String =
    s"CAST(CASE WHEN $a >= $S63 THEN CAST($a AS HUGEINT) - $M64 " +
      s"ELSE CAST($a AS HUGEINT) END AS BIGINT)"

  private def toUnsignedCol(c: String): String =
    s"CAST(CASE WHEN $c < 0 THEN CAST($c AS HUGEINT) + $M64 " +
      s"ELSE CAST($c AS HUGEINT) END AS UBIGINT)"

  // XXH64 primes (Spark's XXH64) and the text kernels' constants
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L
  private val FnvBasis = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** Chain of MATERIALIZED CTEs threading a 64-bit unsigned value. */
  private final class CteChain(prefix: String, src: String, carry0: Seq[String]) {
    private var carry = carry0.toList
    private val ctes = ListBuffer.empty[String]
    private var cur = src
    private var n = 0

    def step(expr: String, kind: String): String = {
      n += 1
      val out = s"${prefix}_$kind$n"
      val name = s"$prefix$n"
      ctes += s"$name AS MATERIALIZED (SELECT ${carry.mkString(", ")}, $expr AS $out FROM $cur)"
      cur = name
      carry = carry :+ out
      out
    }
    def drop(cols: Set[String]): Unit = carry = carry.filterNot(cols)

    /** Wrapping 64-bit multiply by a constant, via 32-bit halves. */
    def umul(a: String, b: Long): String = {
      val blo = b & 0xFFFFFFFFL
      val bhi = b >>> 32
      step(
        s"CAST((CAST(($a & 4294967295) * ${u(blo)} AS HUGEINT) + " +
          s"CAST(((($a & 4294967295) * ${u(bhi)}) % 4294967296 + " +
          s"((($a >> 32)) * ${u(blo)}) % 4294967296) % 4294967296 AS HUGEINT) " +
          s"* 4294967296) % $M64 AS UBIGINT)", "mul")
    }
    def uaddC(a: String, b: Long): String =
      step(s"CAST((CAST($a AS HUGEINT) + CAST(${u(b)} AS HUGEINT)) % $M64 AS UBIGINT)", "add")
    def uxor(a: String, b: String): String = step(s"xor($a, $b)", "xor")
    def xorshr(a: String, sh: Int): String = step(s"xor($a, ($a >> $sh))", "xs")
    def urotl(a: String, r: Int): String =
      step(s"(CAST(CAST(($a % ${u(1L << (64 - r))}) AS HUGEINT) * ${1L << r} AS UBIGINT)" +
        s" | ($a >> ${64 - r}))", "rot")

    def splitmix(h: String): String = {
      var z = uaddC(h, 0x9e3779b97f4a7c15L)
      z = umul(xorshr(z, 30), 0xbf58476d1ce4e5b9L)
      z = umul(xorshr(z, 27), 0x94d049bb133111ebL)
      xorshr(z, 31)
    }
    def fmix(h: String): String = {
      var x = umul(xorshr(h, 33), P2)
      x = umul(xorshr(x, 29), P3)
      xorshr(x, 32)
    }
    /** Spark XXH64.hashLong(inp, seed) — seed as column or constant. */
    def xxhLong(inp: String, seed: Either[Long, String]): String = {
      val k1 = umul(urotl(umul(inp, P2), 31), P1)
      val s = seed match {
        case Left(c)    => step(u(c + P5 + 8), "c")
        case Right(col) => uaddC(col, P5 + 8)
      }
      var h = uxor(s, k1)
      h = uaddC(umul(urotl(h, 27), P1), P4)
      fmix(h)
    }
    /** Spark XXH64.hashInt(i, seed) — i a small non-negative column. */
    def xxhInt(iCol: String, seed: String): String = {
      var h = uaddC(seed, P5 + 4)
      h = uxor(h, umul(iCol, P1))
      h = uaddC(umul(urotl(h, 23), P2), P3)
      fmix(h)
    }
    def render(finalSelect: String, finalName: String): String =
      (ctes :+ s"$finalName AS MATERIALIZED (SELECT $finalSelect FROM $cur)").mkString(",\n")
  }

  /** Shared prefix: tokenize lowercase alnum runs, per-token FNV-1a (one
    * recursive-CTE step per character) + splitmix finalize → `tokh`
    * (doc_id, p, th) — the token-hash stream both text kernels start from.
    */
  private def tokenHashPrefix: String = {
    val cTok = new CteChain("tk", "tfe", Seq("doc_id", "p", "h"))
    val th = cTok.splitmix("h")
    val tokhCte = cTok.render(s"doc_id, p, $th AS th", "tokh")
    val tokStep =
      s"CAST((CAST(xor(h, CAST(ord(substring(tok, cpos + 1, 1)) AS UBIGINT)) AS HUGEINT)" +
        s" * $FnvPrime) % $M64 AS UBIGINT)"
    s"""WITH RECURSIVE raw AS (
       |  SELECT doc_id,
       |         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok,
       |         generate_subscripts(regexp_split_to_array(lower(text), '[^a-z0-9]+'), 1) AS pos
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
       |  FROM raw WHERE tok <> ''),
       |tf AS (
       |  SELECT doc_id, p, tok, 0 AS cpos, ${u(FnvBasis)} AS h FROM toks
       |  UNION ALL
       |  SELECT doc_id, p, tok, cpos + 1, $tokStep
       |  FROM tf WHERE cpos < length(tok)),
       |tfe AS MATERIALIZED (SELECT doc_id, p, h FROM tf WHERE cpos = length(tok)),
       |$tokhCte""".stripMargin
  }

  /** Exact replay of [[graft.text.Dedup.simhashPairs]]: per-token hashes
    * vote per bit, votes fold to the 64-bit fingerprint, 4×16-bit band
    * LSH candidates, bit_count(xor) hamming within `radius`.
    */
  def simhashOracle(radius: Int): String = {
    // exact 2^b values as a lookup table — `<<` is bounds-checked against
    // BIGINT even for UBIGINT operands, and `**` goes through DOUBLE
    val pow2 = (0 to 63).map(b => s"($b,${u(1L << b)})").mkString(",")
    s"""$tokenHashPrefix,
       |pow2 AS (SELECT * FROM (VALUES $pow2) AS t(b, pw)),
       |votes AS (
       |  SELECT doc_id, b,
       |    SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM tokh, range(64) t(b) GROUP BY doc_id, b),
       |sig AS (
       |  SELECT doc_id AS id,
       |    CAST(SUM(CASE WHEN v > 0 THEN vt.pw ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS s
       |  FROM votes JOIN pow2 vt USING (b) GROUP BY doc_id),
       |bandrow AS MATERIALIZED (
       |  SELECT id, b AS band, (s >> (b * 16)) & 65535 AS bh, s
       |  FROM sig, range(4) t(b)),
       |pairs AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
       |    CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
       |  FROM bandrow a JOIN bandrow b
       |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id)
       |SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= $radius
       |ORDER BY a_id, b_id""".stripMargin
  }

  /** Exact replay of [[graft.vector.Clustering.semdedupPairsFixed]] — the
    * whole recursive soft-split discovery unrolled to `maxDepth` static
    * levels. Per level: membership counts, the no-shrink freeze check
    * against the previous level (a child as large as its parent is an
    * argmax-indistinguishable duplicate group), overshoot-adaptive
    * fanout, seed sampling in (xxh64(id), id) order (the id hashes ride
    * one CteChain, reused by every level), float-rounded seed
    * normalization (CAST AS FLOAT = Scala .toFloat, round-to-nearest),
    * member×seed dots, and top-softP/argmax branching with ties to the
    * higher seed index. Settled memberships union into the leaf set;
    * exact cosine verifies within leaves. Every per-level CTE is
    * MATERIALIZED — each references its predecessor several times, so
    * inlining would expand the plan ~4^depth (measured: minutes vs 2.4s).
    * All dots run through `list_dot_product` on DOUBLE[] (bit-identical
    * ascending fold; `centsValues` is the (cell, DOUBLE[]) list form) —
    * the earlier per-pair/per-seed ordered-SUM unnest shape OOM'd the
    * oracle node at sf1.
    */
  def fixedSemdedupOracle(
      centsValues: String,
      maxCell: Int,
      coarseP: Int,
      softP: Int,
      softLevels: Int,
      threshold: Double
  ): String = {
    val enc = graft.vector.Clustering.MaxFanout + 1
    val maxFan = graft.vector.Clustering.MaxFanout
    val maxDepth = graft.vector.Clustering.MaxSplitDepth

    val cId = new CteChain("ih", "ihsrc", Seq("id", "xu"))
    val hh = cId.xxhLong("xu", Left(42L))
    cId.drop(Set("xu"))
    val idhCtes = cId.render(s"id, ${toSigned(hh)} AS u", "idh")

    val levels = new StringBuilder
    val settled = scala.collection.mutable.ListBuffer.empty[String]
    var prev = "m0"
    for (l <- 0 until maxDepth) {
      val sp = if (l < softLevels) softP else 1
      val frz =
        if (l == 0) s"frz_0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS cluster LIMIT 0)"
        else
          s"""frz_$l AS MATERIALIZED (
             |  SELECT c.cluster FROM cnt_$l c JOIN cnt_${l - 1} p
             |    ON p.cluster = (c.cluster - 1) // $enc AND p.cnt = c.cnt)""".stripMargin
      levels.append(
        s"""cnt_$l AS MATERIALIZED (
           |  SELECT cluster, count(*) AS cnt FROM $prev GROUP BY cluster HAVING count(*) > $maxCell),
           |$frz,
           |liv_$l AS MATERIALIZED (
           |  SELECT c.cluster, c.cnt,
           |    least($maxFan, greatest(2, 4 * CAST(ceil(CAST(c.cnt AS DOUBLE) / $maxCell) AS BIGINT))) AS fo
           |  FROM cnt_$l c
           |  WHERE c.cluster NOT IN (SELECT cluster FROM frz_$l WHERE cluster IS NOT NULL)),
           |sr_$l AS MATERIALIZED (
           |  SELECT m.cluster, m.id, v.fo,
           |    row_number() OVER (PARTITION BY m.cluster ORDER BY uh.u, m.id) AS rn
           |  FROM $prev m JOIN liv_$l v USING (cluster) JOIN idh uh ON uh.id = m.id),
           |sv_$l AS MATERIALIZED (
           |  SELECT s.cluster, s.rn - 1 AS sidx,
           |    list_transform(ed.v, x -> CAST(CAST(
           |      CASE WHEN n.nrm = 0 THEN x ELSE x / n.nrm END
           |      AS FLOAT) AS DOUBLE)) AS sv
           |  FROM sr_$l s
           |  JOIN ed ON ed.vec_id = s.id
           |  JOIN vnorm n ON n.vec_id = s.id
           |  WHERE s.rn <= s.fo),
           |d_$l AS MATERIALIZED (
           |  SELECT m.id, m.cluster, s.sidx,
           |    list_dot_product(ev.v, s.sv) AS dot
           |  FROM $prev m
           |  JOIN ed ev ON ev.vec_id = m.id
           |  JOIN sv_$l s ON s.cluster = m.cluster),
           |set_$l AS MATERIALIZED (
           |  SELECT id, cluster FROM $prev
           |  WHERE cluster NOT IN (SELECT DISTINCT cluster FROM sv_$l)),
           |m${l + 1} AS MATERIALIZED (
           |  SELECT id, cluster * $enc + 1 + sidx AS cluster
           |  FROM (SELECT id, cluster, sidx,
           |          row_number() OVER (PARTITION BY id, cluster ORDER BY dot DESC, sidx DESC) AS r
           |        FROM d_$l)
           |  WHERE r <= $sp),
           |""".stripMargin)
      settled += s"SELECT id, cluster FROM set_$l"
      prev = s"m${l + 1}"
    }
    settled += s"SELECT id, cluster FROM $prev"

    s"""WITH cents AS (SELECT * FROM (VALUES $centsValues) AS t(cell, cv)),
       |ed AS MATERIALIZED (
       |  SELECT vec_id, CAST(CAST(embedding AS FLOAT[]) AS DOUBLE[]) AS v FROM embeddings),
       |dots AS MATERIALIZED (
       |  SELECT ed.vec_id, c.cell, list_dot_product(ed.v, c.cv) AS dot
       |  FROM ed CROSS JOIN cents c),
       |ranked AS MATERIALIZED (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell DESC) AS rk
       |  FROM dots),
       |m0 AS MATERIALIZED (
       |  SELECT vec_id AS id, CAST(cell AS BIGINT) + 1 AS cluster
       |  FROM ranked WHERE rk <= $coarseP),
       |vnorm AS MATERIALIZED (
       |  SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm FROM ed),
       |ihsrc AS MATERIALIZED (
       |  SELECT id, CAST(CASE WHEN id < 0 THEN CAST(id AS HUGEINT) + $M64
       |                       ELSE CAST(id AS HUGEINT) END AS UBIGINT) AS xu
       |  FROM (SELECT DISTINCT vec_id AS id FROM embeddings)),
       |$idhCtes,
       |${levels.toString}leaf AS MATERIALIZED (${settled.mkString(" UNION ALL ")}),
       |prs AS MATERIALIZED (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM leaf a JOIN leaf b ON a.cluster = b.cluster AND a.id < b.id),
       |scored AS MATERIALIZED (
       |  SELECT p.a_id, p.b_id,
       |    CASE WHEN na.nrm * nb.nrm = 0 THEN 0.0
       |         ELSE list_dot_product(ea.v, eb.v) / (na.nrm * nb.nrm) END AS c
       |  FROM prs p
       |  JOIN ed ea ON ea.vec_id = p.a_id
       |  JOIN ed eb ON eb.vec_id = p.b_id
       |  JOIN vnorm na ON na.vec_id = p.a_id
       |  JOIN vnorm nb ON nb.vec_id = p.b_id)
       |SELECT a_id, b_id, round(c, 6) AS cosine FROM scored
       |WHERE c >= $threshold ORDER BY a_id, b_id""".stripMargin
  }

  /** Exact replay of [[graft.operators.Sketches.eventSketch]]: XXH64 of
    * user/event ids (sign-bit-flipped so signed order = unsigned order),
    * per-group KMV rank/estimate and bottom-k sample with interpolated
    * percentiles — all estimator arithmetic mirrors the Spark op order
    * exactly (2^63/2^64 are exact doubles; no libm anywhere), so the
    * estimates hash-match without tolerance.
    */
  def kmvSketchOracle(kDistinct: Int, kSample: Int, quantiles: Seq[Double]): String = {
    val cU = new CteChain("ku", "usrc", Seq("g", "xu"))
    val uh = cU.xxhLong("xu", Left(42L))
    cU.drop(Set("xu"))
    // NULL key parity: Spark's xxhash64 SKIPS a null child, returning the
    // seed (42) — a NULL user_id is one real distinct value on the Spark
    // side. The SQL chain propagates NULL instead, so coalesce to the
    // same 42^minLong the Spark expression produces.
    val uCte = cU.render(
      s"g, COALESCE(xor(${toSigned(uh)}, -9223372036854775808), " +
        s"${42L ^ Long.MinValue}) AS u", "uhash")

    val cE = new CteChain("ke", "esrc", Seq("g", "v", "sid", "su"))
    val eh = cE.xxhLong("su", Left(42L))
    cE.drop(Set("su"))
    val eCte = cE.render(
      s"g, v, sid, xor(${toSigned(eh)}, -9223372036854775808) AS u2", "ehash")

    val km1 = (kDistinct - 1).toDouble
    // row-level per-quantile positions (tiny expressions — lateral
    // aliases are fine here, no hash chains involved)
    val posCols = quantiles.map { q =>
      val nm = (q * 100).round
      s"$q * CAST(m - 1 AS DOUBLE) AS pos_$nm, floor(pos_$nm) AS lo_$nm, " +
        s"pos_$nm - lo_$nm AS frac_$nm"
    }.mkString(",\n    ")
    val pctAggs = quantiles.map { q =>
      val nm = (q * 100).round
      val vLo = s"max(CASE WHEN vr = lo_$nm + 1 THEN v END)"
      val vHi = s"max(CASE WHEN vr = least(lo_$nm + 2, CAST(m AS DOUBLE)) THEN v END)"
      s"$vLo + ($vHi - $vLo) * max(frac_$nm) AS p${nm}_value"
    }.mkString(",\n    ")

    s"""WITH usrc AS MATERIALIZED (
       |  SELECT DISTINCT event_type AS g, ${toUnsignedCol("user_id")} AS xu
       |  FROM events),
       |$uCte,
       |kmv AS (
       |  SELECT g, max(r) AS nh, max(CASE WHEN r = $kDistinct THEN u END) AS vk
       |  FROM (SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u) AS r
       |        FROM (SELECT DISTINCT g, u FROM uhash))
       |  GROUP BY g),
       |est AS (
       |  SELECT g,
       |    CASE WHEN nh < $kDistinct THEN CAST(nh AS DOUBLE)
       |         ELSE $km1 / ((CAST(vk AS DOUBLE) + 9.223372036854775808e18)
       |                      / 1.8446744073709551616e19) END AS kmv_distinct
       |  FROM kmv),
       |esrc AS MATERIALIZED (
       |  SELECT event_type AS g, value AS v, event_id AS sid,
       |         ${toUnsignedCol("event_id")} AS su
       |  FROM events
       |  -- NULL row parity: the Spark sample aggregate skips a row when
       |  -- the sample id or the value is null (BoundedMinKSample.update)
       |  WHERE event_id IS NOT NULL AND value IS NOT NULL),
       |$eCte,
       |sampled AS (
       |  SELECT g, v FROM (
       |    -- v as the final tiebreak mirrors the heap's total (key, sid,
       |    -- payload) order: duplicate sample ids then resolve identically on
       |    -- both engines instead of by task/scan order
       |    SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY u2, sid, v) AS sr
       |    FROM ehash) WHERE sr <= $kSample),
       |ranked AS (
       |  SELECT g, v,
       |    row_number() OVER (PARTITION BY g ORDER BY v) AS vr,
       |    count(*) OVER (PARTITION BY g) AS m
       |  FROM sampled),
       |rq AS (
       |  SELECT *,
       |    $posCols
       |  FROM ranked),
       |pcts AS (
       |  SELECT g,
       |    $pctAggs
       |  FROM rq GROUP BY g)
       |SELECT e.g AS event_type, e.kmv_distinct, ${quantiles.map(q => s"p${(q * 100).round}_value").mkString(", ")}
       |-- LEFT + null-safe, mirroring the Spark side's <=> join: a group
       |-- whose sample rows were ALL null has no pcts row here (esrc
       |-- filters them) but must still be emitted with NULL percentiles
       |-- (Sketches' m=0 guard), and a NULL group key is a real group
       |FROM est e LEFT JOIN pcts p ON e.g IS NOT DISTINCT FROM p.g
       |ORDER BY e.g""".stripMargin
  }

  /** Exact replay of [[graft.text.Dedup.minhashPairs]]: tokenized FNV-1a +
    * splitmix token hashes ([[expressions.TextKernels.shingleHashes]]),
    * n=3 window FNV combine, K chained-XXH64 signature slots (signed MIN),
    * per-band variadic XXH64 buckets, candidate pairs, and exact Jaccard
    * over distinct shingle-hash sets.
    */
  def minhashOracle(n: Int, k: Int, bands: Int, threshold: Double): String = {
    require(n == 3, "window combine below is written for n=3")
    require(k % bands == 0 && k / bands == 2, "band hash below is written for rows=2")

    val cSh = new CteChain("sw", "wndf", Seq("doc_id", "th0", "th1", "th2"))
    var v = cSh.umul(cSh.uxor(u(FnvBasis), "th0"), FnvPrime)
    v = cSh.umul(cSh.uxor(v, "th1"), FnvPrime)
    v = cSh.umul(cSh.uxor(v, "th2"), FnvPrime)
    cSh.drop(Set("th0", "th1", "th2"))
    val shh = cSh.splitmix(v)
    val shCte = cSh.render(s"doc_id AS id, $shh AS h", "sh")

    val cSl = new CteChain("sl", "slots0", Seq("id", "i", "h"))
    val hl = cSl.xxhLong("h", Left(42L))
    cSl.drop(Set("h"))
    val sm = cSl.xxhInt("CAST(i AS UBIGINT)", hl)
    val slotCte = cSl.render(s"id, i, ${toSigned(sm)} AS sh", "sloth")

    val cBd = new CteChain("bd", "bandrow", Seq("id", "band", "me_u", "mo_u"))
    val s1 = cBd.xxhLong("me_u", Left(42L))
    cBd.drop(Set("me_u"))
    val s2 = cBd.xxhLong("mo_u", Right(s1))
    cBd.drop(Set("mo_u"))
    val bh = cBd.xxhInt("CAST(band AS UBIGINT)", s2)
    val bandCte = cBd.render(s"id, band, ${toSigned(bh)} AS bh", "banded")

    s"""$tokenHashPrefix,
       |wndf AS MATERIALIZED (
       |  SELECT doc_id, th AS th0,
       |         lead(th, 1) OVER w AS th1, lead(th, 2) OVER w AS th2
       |  FROM tokh WINDOW w AS (PARTITION BY doc_id ORDER BY p)
       |  QUALIFY th2 IS NOT NULL),
       |$shCte,
       |slots0 AS MATERIALIZED (SELECT id, h, i FROM sh, range($k) t(i)),
       |$slotCte,
       |sigrow AS MATERIALIZED (SELECT id, i, MIN(sh) AS m FROM sloth GROUP BY id, i),
       |bandrow AS MATERIALIZED (
       |  SELECT e.id, CAST(e.i // 2 AS INT) AS band,
       |    ${toUnsignedCol("e.m")} AS me_u,
       |    ${toUnsignedCol("o.m")} AS mo_u
       |  FROM sigrow e JOIN sigrow o ON o.id = e.id AND o.i = e.i + 1
       |  WHERE e.i % 2 = 0),
       |$bandCte,
       |pairs AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id),
       |shd AS MATERIALIZED (SELECT DISTINCT id, h FROM sh),
       |sizes AS MATERIALIZED (SELECT id, count(*) AS n FROM shd GROUP BY id),
       |inter AS (
       |  SELECT p.a_id, p.b_id, count(*) AS i
       |  FROM pairs p
       |  JOIN shd x ON x.id = p.a_id
       |  JOIN shd y ON y.id = p.b_id AND y.h = x.h
       |  GROUP BY p.a_id, p.b_id),
       |jac AS (
       |  SELECT i.a_id, i.b_id,
       |    CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
       |  FROM inter i
       |  JOIN sizes sa ON sa.id = i.a_id
       |  JOIN sizes sb ON sb.id = i.b_id)
       |SELECT a_id, b_id, jaccard FROM jac WHERE jaccard >= $threshold
       |ORDER BY a_id, b_id""".stripMargin
  }
}
