package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate detection — the vector-space member of
  * the dedup family (exact text hash < MinHash/SimHash < embedding
  * cosine, in order of semantic looseness).
  *
  * Exact form: all-pairs with the fixed-dimension codegen'd cosine —
  * quadratic, the verification oracle and small-corpus baseline.
  *
  * Scale form: random-hyperplane LSH buckets prune candidates first
  * (vectors with cosine ≥ τ agree on most hyperplane signs, so they
  * share a bucket with high probability); the exact kernel then verifies
  * only bucket-mates. Only (id, bucket) pairs shuffle for candidate
  * generation — embeddings are re-attached to survivors.
  */
object CosineDedup {

  /** Exact all-pairs cosine near-dup pairs (a_id < b_id, cosine >= τ).
    * Norms are hoisted per VECTOR (not per pair) — bit-identical values,
    * one third the per-pair flops.
    */
  def exactPairs(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // The streamed side of the nested-loop keeps the scan's partitioning —
    // widen it ([[Similarity.widen]]) or the O(n²) kernel single-threads.
    val base = Similarity.widen(embeddings).select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.normFixed(col(vecCol), dim).as("nrm"))
    val a = base.select(col("id").as("a_id"), col("v").as("a_v"), col("nrm").as("a_n"))
    val b = base.select(col("id").as("b_id"), col("v").as("b_v"), col("nrm").as("b_n"))
    val cosine =
      when(col("a_n") * col("b_n") === 0, lit(0.0))
        .otherwise(Similarity.dotFixed(col("a_v"), col("b_v"), dim) / (col("a_n") * col("b_n")))
    // Both predicates live in the join condition DELIBERATELY, cheap id
    // clause first: a pushed-down threshold filter lands AHEAD of the id
    // clause in the nested-loop condition and evaluates the full dot
    // product for every ordered pair (measured 8x slower). The surviving
    // handful of pairs re-evaluate the dot once more in the projection.
    a.join(b, col("a_id") < col("b_id") && cosine >= threshold)
      .select(col("a_id"), col("b_id"), cosine.as("cosine"))
  }

  /** Tables needed for `targetRecall` at a given threshold and signature
    * width, from the hyperplane-LSH closed form: P(plane agrees) =
    * 1 − arccos(τ)/π, per-table match p^bits, overall 1−(1−p^bits)^L.
    * Low thresholds genuinely need many tables (τ=0.45, bits=4 → 16) —
    * that is the price of recall, not a tuning accident; pick bits so the
    * per-table false-positive rate (≈2^-bits · L of all pairs) stays
    * acceptable for the corpus size.
    */
  def tablesFor(threshold: Double, bits: Int, targetRecall: Double = 0.95): Int = {
    val p = 1 - math.acos(math.min(threshold, 1.0)) / math.Pi
    val pb = math.pow(p, bits)
    math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-pb)).toInt)
  }

  /** Signature width that minimizes estimated total work for a corpus of
    * `n` vectors at `threshold`, holding `targetRecall`.
    *
    * The two cost terms trade against each other: banding writes
    * `n × L(bits)` rows (L from [[tablesFor]], growing ≈ p^-bits), while
    * candidate generation pairs bucket-mates — ≈ `L(bits) × n² / 2^bits`
    * under a uniform-occupancy model. A FIXED bits therefore saturates:
    * once n outgrows `2^bits` buckets, in-bucket pair counts grow
    * quadratically (measured on the sf1 scale curve: the catalog's
    * 4-bit/16-table configuration, sized for the small-SF oracle gate,
    * went 31× for a 10× row step). Minimizing the modeled sum over bits
    * restores the hyperplane-LSH cost exponent — total work ∝
    * n^(1+ρ) with ρ = -log2 p — which is the best this family offers: a
    * LOW threshold (τ=0.45 → p≈0.65, ρ≈0.63) is intrinsically expensive
    * at scale, and a pipeline that can tolerate τ≈0.8 (ρ≈0.33) should.
    */
  def bitsFor(n: Long, threshold: Double, targetRecall: Double = 0.95,
      dim: Int = 64, shuffleUnit: Double = 500.0, pairUnit: Double = 60.0): Int = {
    def cost(bits: Int): Double = {
      // weighted terms, calibrated coarsely against the measured sf1
      // curve: a banded row costs its signature flops (bits×dim, native
      // kernel) plus ~shuffleUnit units of row overhead through the
      // shuffle; a candidate pair costs ~pairUnit units through the
      // join + distinct + verify.
      //
      // SENSITIVITY of the argmin to that coarse calibration, computed
      // over the full (500, 60) ±4× grid — every combination of
      // shuffleUnit ∈ {125, 500, 2000} × pairUnit ∈ {15, 60, 240} — at
      // τ=0.45, recall 0.97, dim 64 (pinned in CosineDedupIvfSpec):
      //
      //   n       argmin(baseline)   argmin range over the grid
      //   5e3     7                  4..10
      //   5e5     14                 11..16
      //   5e7     20                 17..22
      //   5e9     24                 24 (the search-ceiling clamp)
      //
      // The argmin moves at most ±3 bits under any ±4× mis-weighting,
      // and — the claim that matters — the baseline-chosen bits, COSTED
      // UNDER the perturbed weights, stays within 1.94× of that weight
      // set's own optimum (worst case over the whole grid; same-
      // direction miscalibration, the realistic kind when both constants
      // were fitted on one box, stays under 1.3×). The model only has to
      // rank 21 integer choices on a cost curve that is flat near its
      // minimum, so being 4× wrong about either constant costs tens of
      // percent, never the 10–140× cliff the sizing exists to avoid.
      modeledCost(n, threshold, targetRecall, dim, bits, shuffleUnit, pairUnit)
    }
    (4 to 24).minBy(cost)
  }

  /** The modeled cost at `bits` — exposed so the sensitivity pin in
    * CosineDedupIvfSpec asserts the comment's numbers against the code
    * instead of restating the formula.
    */
  private[graft] def modeledCost(n: Long, threshold: Double, targetRecall: Double,
      dim: Int, bits: Int, shuffleUnit: Double, pairUnit: Double): Double = {
    val l = tablesFor(threshold, bits, targetRecall).toDouble
    l * n * (bits.toDouble * dim + shuffleUnit) +
      l * n.toDouble * n.toDouble / math.pow(2.0, bits) * pairUnit
  }

  /** [[lshPairs]] with corpus-sized parameters: one metadata-cheap
    * count picks the cost-minimizing signature width ([[bitsFor]]) and
    * the recall-holding table count ([[tablesFor]]); banding runs
    * through the native multi-table signature kernel
    * ([[graft.vector.expressions.LshSignatures]] — one array-returning
    * call with executor-cached planes), because the literal-plane form
    * the small-SF catalog query uses ships tables×bits×dim floats in
    * every task and blows codegen once the table count grows past a few
    * dozen. The scale entrypoint — fixed (bits, tables) saturate their
    * bucket count and go quadratic beyond the corpus they were sized
    * for (measured: 31× for a 10× step at sf1).
    */
  def lshPairsAuto(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.8,
      targetRecall: Double = 0.95,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val n = math.max(1L, embeddings.count())
    val bits = bitsFor(n, threshold, targetRecall, dim)
    val tables = tablesFor(threshold, bits, targetRecall)
    lshPairsSized(embeddings, dim, threshold, bits, tables, idCol, vecCol,
      expectedBandedRows = Some(n * tables))
  }

  /** The auto path's banding with the (bits, tables) decision hoisted to
    * the caller — the catalog row uses this so it can CAPTURE the sizes
    * it ran with for the replay oracle (the decision itself stays
    * deterministic: [[bitsFor]]/[[tablesFor]] of the corpus count).
    */
  /** Banded rows per reducer for the data-derived join width below: with
    * cost-model-sized bits the in-bucket occupancy is bounded, so pair
    * work is ~linear per banded row and rows/task is the right sizing
    * proxy; ~1M rows is seconds of compute-dense work per task.
    */
  private val TargetBandedRowsPerTask = 1L << 20

  def lshPairsSized(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double,
      bits: Int,
      tables: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      expectedBandedRows: Option[Long] = None
  ): DataFrame = {
    val base = eligible(embeddings, idCol, vecCol)
    // Width from DATA SIZE when the caller knows it (dd_embed_lsh pays a
    // sizing count anyway), clamped to [cores, 64×cores]: the static
    // core count is right at the gate SFs (explicit counts are exempt
    // from AQE coalescing — see [[lshPairs]]) but is a per-task-state
    // ceiling once n×L outgrows it, exactly the oversized-sort hazard
    // the r17 posture note documents; the 64× cap keeps task counts sane
    // while the core count itself scales with the cluster.
    val cores = embeddings.sparkSession.sessionState.conf.defaultNumShufflePartitions
    val parts = expectedBandedRows.fold(cores) { rows =>
      math.min(64L * cores,
        math.max(cores.toLong, rows / TargetBandedRowsPerTask)).toInt
    }
    val banded = base.select(
      col("id"),
      posexplode(graft.vector.expressions.VectorExpressions
        .vecLshSignatures(col("v"), tables, bits, seed = 42L)))
      .withColumnRenamed("pos", "table")
      .withColumnRenamed("col", "sig")
      .repartition(parts, col("table"), col("sig"))
    verifyCandidates(base, banded, dim, threshold)
  }

  /** Degenerate-embedding exclusion shared by both banding paths (see
    * the inline note in [[lshPairs]]).
    */
  private def eligible(embeddings: DataFrame, idCol: String, vecCol: String) =
    embeddings
      .filter(col(vecCol).isNotNull && exists(col(vecCol), x => x =!= lit(0.0f)))
      .select(col(idCol).as("id"), col(vecCol).as("v"))

  /** Bucket-mate candidate generation + exact-cosine verification over a
    * banded frame of (id, table, sig) — the shared tail of the fixed and
    * auto paths.
    */
  private def verifyCandidates(base: DataFrame, banded: DataFrame, dim: Int,
      threshold: Double): DataFrame = {
    val pairs = banded.alias("x")
      .join(banded.alias("y"),
        col("x.table") === col("y.table") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()
    pairs
      .join(base.select(col("id").as("a_id"), col("v").as("a_v")), Seq("a_id"))
      .join(base.select(col("id").as("b_id"), col("v").as("b_v")), Seq("b_id"))
      .withColumn("cosine", Similarity.cosineFixed(col("a_v"), col("b_v"), dim))
      .filter(col("cosine") >= threshold)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** LSH-bucketed near-dup pairs: candidates share a signature bucket in
    * at least one of `tables` independent hash tables; exact cosine
    * verifies. Recall rises with tables; cost stays near-linear while
    * the corpus fits the bucket count — size (bits, tables) with
    * [[bitsFor]]/[[tablesFor]] (or call [[lshPairsAuto]]); defaults suit
    * τ ≈ 0.8 at small corpora.
    */
  def lshPairs(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.8,
      // recall math: P(plane agrees) = 1 - arccos(τ)/π; per-table match =
      // p^bits; overall = 1-(1-p^bits)^tables. Short signatures × many
      // tables beats one long signature for moderate thresholds.
      bits: Int = 6,
      tables: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // Shape note (measured): verifying the cosine INSIDE the bucket join
    // (exactPairs-style residual condition, survivors-only output) was
    // tried for the heavy-collision low-τ regime and is ~40% SLOWER here —
    // with many tables a colliding pair co-buckets in up to `tables`
    // buckets, so the in-join verify re-evaluates the same pair's dot
    // product per table, while this candidates-only shape distinct-dedups
    // pairs BEFORE the one-cosine-per-pair verification. The candidate
    // materialization is the cheaper side of that trade at every tested
    // configuration; revisit only if per-pair verification cost drops
    // below the shuffle cost of a candidate row.
    // degenerate embeddings (NULL, or all-zero — failed embedding rows
    // are common in real corpora) are EXCLUDED before banding: a zero
    // vector's every hyperplane dot is 0, so all m of them share one
    // bucket in every table and the self-join goes m²/2 for pairs the
    // cosine verify would drop anyway (the same quadratic guard
    // simhashPairs applies to token-less documents)
    val base = eligible(embeddings, idCol, vecCol)
    // The bucket self-join is compute-dense per BYTE (in-bucket pair
    // fan-out is quadratic), so AQE's byte-targeted partition coalescing
    // under-parallelizes it — measured 12 post-coalesce tasks carrying 3s
    // of pair CPU. An explicit partition count on the bucket key pins the
    // join's width to the session's shuffle parallelism (explicit counts
    // are exempt from AQE coalescing) and co-partitions both aliases, so
    // the self-join adds no further shuffle. The count is the STATIC
    // `spark.sql.shuffle.partitions` (scales with the core count), NOT
    // `numShufflePartitions`: under AQE coalescing that getter reports
    // `initialPartitionNum` (8× cores, r17 posture) and an explicit
    // count at that width pins 8 uncoalescible ~ms tasks per core here.
    val parts = embeddings.sparkSession.sessionState.conf.defaultNumShufflePartitions
    val banded = base.select(
      col("id"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("table"),
          Similarity.lshSignature(col("v"), dim, bits, seed = 42L + t).as("sig"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.table"), col("bk.sig"))
      .repartition(parts, col("table"), col("sig"))
    verifyCandidates(base, banded, dim, threshold)
  }
}
