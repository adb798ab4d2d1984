package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering operators: spherical k-means assignment and
  * SemDeDup-style semantic deduplication (cluster first, then exact
  * cosine verification ONLY within clusters — Abbas et al. 2023's recipe
  * for making embedding dedup sub-quadratic).
  *
  * Scale shape: centroids are a tiny driver-held array (k × dim floats),
  * refined by Lloyd iterations that are each ONE scan with map-side
  * combined per-(cell, dim) partial means ([[Ivf.refineCentroids]]);
  * assignment is a codegen'd argmax-dot projection ([[Ivf.cellOf]] —
  * no shuffle); the SemDeDup pair join shuffles each vector ONCE on its
  * cluster key, and the quadratic cosine verification runs only inside
  * each cluster's partition (corpus-quadratic → cluster-quadratic).
  */
object Clustering {

  /** Refined centroid set: deterministic hash-ordered seed sample
    * ([[Ivf.centroids]]) + `iterations` spherical Lloyd steps.
    */
  def centroids(
      embeddings: DataFrame,
      k: Int = 16,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Array[Seq[Float]] =
    Ivf.refineCentroids(embeddings, Ivf.centroids(embeddings, k, idCol, vecCol),
      iterations, vecCol)

  /** K-means cluster assignment: (id, cluster). */
  def assign(
      embeddings: DataFrame,
      k: Int = 16,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    assignTo(embeddings, centroids(embeddings, k, iterations, idCol, vecCol), idCol, vecCol)

  /** Assignment against a precomputed centroid set. */
  def assignTo(
      embeddings: DataFrame,
      cents: Array[Seq[Float]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    embeddings.select(col(idCol), Ivf.cellOf(col(vecCol), cents).as("cluster"))

  /** Mean cosine of each vector to its assigned (unit-norm) centroid —
    * the spherical-k-means objective (higher is tighter). Driver-side
    * scalar, used by the convergence invariant test.
    */
  def meanAssignedCosine(
      embeddings: DataFrame,
      cents: Array[Seq[Float]],
      dim: Int,
      vecCol: String = "embedding"
  ): Double = {
    val dots: Seq[Column] = cents.toIndexedSeq.map(c =>
      graft.vector.expressions.VectorExpressions.vecDot(col(vecCol), typedlit(c.toArray)))
    val nrm = Similarity.normFixed(col(vecCol), dim)
    // greatest() requires >= 2 arguments — a single-centroid set (k=1, or
    // a 1-row sample) must not throw AnalysisException
    val best = if (dots.length == 1) dots.head else greatest(dots: _*)
    embeddings
      .select((when(nrm === 0, lit(0.0))
        .otherwise(best / nrm)).as("c"))
      .agg(avg(col("c"))).head().getDouble(0)
  }

  /** SemDeDup: near-duplicate pairs (a_id < b_id, cosine ≥ τ) found by
    * exact cosine verification WITHIN k-means clusters only — each vector
    * soft-assigned to its `p` nearest cells (a pair co-buckets if ANY of
    * the p×p cell combinations overlap, rescuing near-threshold pairs
    * between two cells: measured recall 0.29 → 1.0 at p=2 on the
    * near-uniform testdata). Misses cross-cluster pairs by design —
    * recall against the all-pairs twin is bounded in ClusteringSpec;
    * precision is exact (every emitted pair is verified).
    */
  def semdedupPairs(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.45,
      k: Int = 16,
      iterations: Int = 2,
      p: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    semdedupPairsWith(embeddings, centroids(embeddings, k, iterations, idCol, vecCol),
      dim, threshold, p, idCol, vecCol)

  /** [[semdedupPairs]] against a precomputed centroid set — lets the
    * caller capture the exact centroid literals (the DuckDB oracle replays
    * the same soft assignment + within-cluster cosine against them).
    */
  def semdedupPairsWith(
      embeddings: DataFrame,
      cents: Array[Seq[Float]],
      dim: Int,
      threshold: Double = 0.45,
      p: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    // One scan: id, payload, norm, and the exploded top-p cells together.
    val base = embeddings.select(
        col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normFixed(col(vecCol), dim).as("nrm"),
        explode(Ivf.topCells(col(vecCol), cents, p)).as("cluster"))
    pairsWithin(base, dim, threshold)
  }

  /** Exact-cosine pair verification within shared `cluster` values over a
    * prepared (id, v, nrm, cluster) frame.
    *
    * Equi-join on the cluster key (hash-partitioned, cluster-quadratic
    * only); the cheap id-ordering clause prunes half the pairs BEFORE the
    * dot-product kernel runs, then the cosine is materialized ONCE as a
    * column — structurally a single kernel evaluation per surviving pair,
    * instead of leaving filter/agg copies for optimizer CSE to merge.
    * The final aggregate dedups pairs that co-bucket in more than one
    * cell (the cosine is identical on every copy).
    */
  private def pairsWithin(base: DataFrame, dim: Int, threshold: Double): DataFrame = {
    val a = base.select(col("id").as("a_id"), col("v").as("a_v"),
      col("nrm").as("a_n"), col("cluster"))
    val b = base.select(col("id").as("b_id"), col("v").as("b_v"),
      col("nrm").as("b_n"), col("cluster"))
    val cosine =
      when(col("a_n") * col("b_n") === 0, lit(0.0))
        .otherwise(Similarity.dotFixed(col("a_v"), col("b_v"), dim) / (col("a_n") * col("b_n")))
    a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine)
      .filter(col("cos") >= threshold)
      .groupBy(col("a_id"), col("b_id"))
      .agg(first(col("cos")).as("cosine"))
  }

  /** Fanout cap and depth cap for recursive cell splitting. Labels are
    * path-encoded in Long base (MaxFanout+1): depth-d labels occupy
    * [base^(d-1), base^d), so terminated cells from different depths can
    * never collide; base 65 at depth 9 stays under Long.MaxValue, and
    * fanout^depth = 64^9 cells is beyond any corpus. Fanout per split is
    * ADAPTIVE — ~2× the cell's overshoot factor, capped at MaxFanout —
    * because a fixed k=16 was measured to shrink big uniform cells
    * painfully slowly (9 levels for 25k→256 at 200k rows; random argmax
    * Voronoi children are lopsided, one seed keeps most of the cell).
    * The depth cap also terminates the one unsplittable case — more than
    * maxCell IDENTICAL vectors argmax together forever (run exact dedup
    * first; such a cell is trivially all-pairs anyway) — though those are
    * normally caught earlier and frozen by the no-shrink check.
    */
  val MaxFanout = 64
  val MaxSplitDepth = 9

  /** Recursively split every cluster larger than `maxCell` with a k-way
    * argmax-dot partition around seeds sampled INSIDE the cluster
    * (deterministic: first k rows in xxhash64(id) order, unit-normalized).
    * With `softP` > 1 each member lands in its softP nearest child cells
    * for the first `softLevels` splits — the same soft-assignment recall
    * rescue the coarse level uses (a borderline pair straddling a child
    * boundary still co-buckets), concentrated where cells are coarsest.
    * Membership multiplies by ≤ softP^softLevels TOTAL (soft at every
    * level was measured 2^depth = unusable: 65× wall at a 40× size step);
    * use softP=1 for a partition (one label per id).
    *
    * Runs as DISCOVERY + REBUILD. Discovery loops levels, but every
    * level's frame is rebuilt FROM SCRATCH as base + one walk UDF over
    * the merged seed map (labels are globally unique by the prefix-free
    * encoding), so the logical plan stays constant-size — chaining a
    * join + UDF per level was measured to blow up planning time
    * superlinearly (20-45s per LATE level on 200k rows, all of it
    * driver-side analysis). The base is repartitioned to the session
    * shuffle parallelism and cached once: the raw parquet arrives in 1-4
    * partitions, which single-threads every UDF pass (measured 46s for
    * the first relabel at 200k rows before the repartition). Per level:
    * one count aggregate, one windowed seed sample over still-oversized
    * rows (flagged via broadcast join — an `isin` literal list of up to
    * k^d labels blows up codegen), one driver merge. A child cell that
    * did not shrink below its parent's count is argmax-indistinguishable
    * (near/exact-duplicate group) and is FROZEN rather than re-split to
    * the depth cap. Rebuild returns base + walk with no pinned blocks.
    *
    * Driver/seed-map bound: total split cells × k × dim floats — at most
    * n/maxCell × k vectors, e.g. 10^10 docs at maxCell 10^5 → 400 MB;
    * beyond that, seeds would move to a join. Levels ≈ log_k(n/maxCell),
    * each one full walk recompute → discovery is O(n·depth²) dot work
    * and O(n log n) scan work — the linear path the √n-cell form lacks.
    */
  private[vector] def splitOversized(
      start: DataFrame, maxCell: Int, k: Int, softP: Int = 1,
      softLevels: Int = 1, maxDepth: Int = MaxSplitDepth
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2 to make progress, got $k")
    // coarse labels are cellOf+1 in [1, k]; the base-(MaxFanout+1) path
    // encoding is prefix-free only while they stay below the first
    // depth-2 label (enc + 1) — a larger coarse k would alias unrelated
    // coarse cells onto child labels and silently merge their clusters
    require(k <= MaxFanout,
      s"coarse k must be <= $MaxFanout (the label-encoding base), got $k")
    require(softP >= 1 && softP <= k, s"softP must be in [1, k], got $softP")
    // Known sharp edge, for the record: the no-shrink freeze below
    // compares a child's member count to its parent's; under soft
    // assignment (softP > 1) one seed inside every member's top-softP
    // makes the counts equal and freezes a still-oversized cell (its
    // exact verify then runs quadratic in that one cell). The replay
    // oracle mirrors the same rule, so engine and oracle agree; lowering
    // softP (or the hard levels below the first) is the mitigation.
    val spark = start.sparkSession
    val enc = MaxFanout + 1
    // Narrow inputs single-thread every UDF pass (measured 46s for one
    // 200k-row pass) — widen to session parallelism ([[Similarity.widen]]).
    val base = Similarity.widen(start).persist()
    val merged = scala.collection.mutable.Map.empty[Long, Array[Array[Float]]]
    val frozen = scala.collection.mutable.Set.empty[Long]
    var prevCounts = Map.empty[Long, Long]

    // THE split-decision kernel, shared by the discovery step and the
    // rebuild walk below: top-`sp` children of `label` by dot against its
    // seed snapshot, ties to the HIGHER seed index (the Ivf.cellOf/
    // topCells order). The rebuild REPLAYS discovery, so this decision
    // must be one implementation — two copies drifting apart (tie order,
    // norm handling, soft condition) would make the final walk produce
    // leaf labels discovery never created. A val lambda so both udf
    // closures capture it by value (serializable).
    val splitChildren: (Long, scala.collection.Seq[Float], Array[Array[Float]], Int) => List[Long] =
      (label, v, ss, sp) => {
        val dots = Array.tabulate(ss.length) { i =>
          val p = ss(i)
          var acc = 0.0
          var j = 0
          val n = math.min(v.length, p.length)
          while (j < n) { acc += v(j).toDouble * p(j).toDouble; j += 1 }
          acc
        }
        (0 until ss.length).sortBy(i => (-dots(i), -i)).take(sp)
          .map(best => label * enc + 1 + best).toList
      }

    // one UDF walking coarse label → leaf labels against a seed-map
    // snapshot (children count = that label's seed count); top-sp
    // children by dot with ties to the HIGHER seed index (the ordering
    // of Ivf.cellOf/topCells), branching only at soft levels
    def walkUdf(snapshot: Map[Long, Array[Array[Float]]]) = {
      val bc = spark.sparkContext.broadcast(snapshot)
      val sl = softLevels
      val sp = softP
      val cap = maxDepth + 1
      udf { (label0: Long, v: scala.collection.Seq[Float]) =>
        val map = bc.value
        var frontier = List(label0)
        var leaves = List.empty[Long]
        var d = 0
        while (frontier.nonEmpty && d < cap) {
          val (toSplit, settled) = frontier.partition(map.contains)
          leaves = settled ::: leaves
          frontier = toSplit.flatMap(label =>
            splitChildren(label, v, map(label), if (d < sl) sp else 1))
          d += 1
        }
        leaves ::: frontier
      }
    }
    def framed(): DataFrame =
      if (merged.isEmpty) base
      else base.withColumn("cluster",
        explode(walkUdf(merged.toMap)(col("cluster"), col("v"))))

    // Discovery iterates a WORKING SET: only rows in still-oversized
    // cells survive a level (settled cells can never change again), so
    // the set shrinks geometrically and each level is one split step over
    // it — recomputing the full walk frame per level cost 2 × 6.6s × depth
    // at 200k rows (91s discovery); this form does the same decisions
    // over the cached remainder.
    var ws = base
    var wsPinned: Option[DataFrame] = None
    var superseded: Option[DataFrame] = None
    var depth = 0
    var done = false
    // a job failure mid-discovery must not strand cached blocks in the
    // block manager (the serving path asserts cache-neutrality), so the
    // unpersists run on EVERY exit path, not just success
    try {
      // no separate materialization action: the first level's window job
      // fills base's cache as it runs (one fewer sequential job in a
      // loop whose wall is driver round-trips, r17)
      while (!done && depth < maxDepth) {
        // ONE job per level: cell size and the xxhash64-ordered sample rank
        // share a window pass, and the adaptive fanout cut (~4× the
        // overshoot factor — over-provisioning costs nothing since children
        // under maxCell just settle, while lopsided argmax Voronoi children
        // make under-provisioned splits shrink slowly: fixed k=16 needed 9
        // levels for 25k→256) is applied inline, so the collect returns
        // exactly the seed rows tagged with their cell's count. This job
        // also materializes the (lazy) working set into its cache.
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cluster")).orderBy(xxhash64(col("id")), col("id"))
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
        val fanoutCol = least(lit(MaxFanout.toLong),
          greatest(lit(2L), lit(4L) * ceil(col("cnt").cast("double") / maxCell).cast("long")))
        val seedRows = ws
          .withColumn("cnt", count(lit(1)).over(wAll))
          .filter(col("cnt") > maxCell)
          .withColumn("rn", row_number().over(wOrd))
          .filter(col("rn") <= fanoutCol)
          .select(col("cluster"), col("cnt"), col("v"))
          .collect()
        // the previous level's cache is safe to drop now — this level's
        // frame just materialized
        superseded.foreach(_.unpersist(blocking = false))
        superseded = None
        val counts: Map[Long, Long] =
          seedRows.map(r => r.getLong(0) -> r.getLong(1)).toMap
        // a child as large as its just-split parent means no member moved:
        // every vector argmaxes identically against any seed choice
        counts.keys.foreach { c =>
          if (prevCounts.get((c - 1) / enc).contains(counts(c))) frozen += c
        }
        val seeds: Map[Long, Array[Array[Float]]] = seedRows
          .filterNot(r => frozen(r.getLong(0)))
          .groupBy(_.getLong(0))
          .map { case (label, rws) =>
            label -> rws.map { r =>
              val c = r.getSeq[Float](2)
              val n = math.sqrt(c.iterator.map(x => x.toDouble * x.toDouble).sum)
              (if (n == 0) c.map(_.toDouble) else c.map(_ / n)).map(_.toFloat).toArray
            }
          }
        if (seeds.isEmpty) done = true
        else {
          merged ++= seeds
          val bc = spark.sparkContext.broadcast(seeds)
          val sp = if (depth < softLevels) softP else 1
          // one split step — the same decision the final walk makes at this
          // depth: top-sp children by dot, ties to the higher seed index.
          // Rows of right-sized or frozen cells keep their label and are
          // filtered out — the working set is exactly the split rows. The
          // new frame stays LAZY; the next level's window job materializes
          // it, so no extra count() action per level.
          val step = udf { (label: Long, v: scala.collection.Seq[Float]) =>
            bc.value.get(label).fold(List(label))(ss =>
              splitChildren(label, v, ss, sp))
          }
          val next = ws
            .withColumn("parent", col("cluster"))
            .withColumn("cluster", explode(step(col("parent"), col("v"))))
            .filter(col("cluster") =!= col("parent"))
            .drop("parent")
            .persist()
          superseded = wsPinned
          wsPinned = Some(next)
          ws = next
          prevCounts = counts
        }
        depth += 1
      }
    } finally {
      superseded.foreach(_.unpersist(blocking = false))
      wsPinned.foreach(_.unpersist(blocking = false))
      base.unpersist(blocking = false)
    }
    framed()
  }

  /** Fixed-cluster-size assignment: (id, cluster) where every cluster
    * holds at most `maxCell` vectors (identical-vector groups excepted —
    * see [[MaxSplitDepth]]). The SemDeDup paper's actual recipe: cluster
    * count scales with the corpus while cluster SIZE stays constant, so
    * within-cluster work is O(n·maxCell), not O(n^1.5).
    */
  def assignFixedSize(
      embeddings: DataFrame,
      maxCell: Int,
      k: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val cents = Ivf.centroids(embeddings, k, idCol, vecCol)
    val start = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      (Ivf.cellOf(col(vecCol), cents).cast("long") + 1).as("cluster"))
    splitOversized(start, maxCell, k).select(col("id").as(idCol), col("cluster"))
  }

  /** Linear-path SemDeDup: soft top-p coarse assignment (recall rescue,
    * as in [[semdedupPairsWith]]), then recursive splitting of every
    * oversized cell to ≤ `maxCell` members — soft (top-`softP` child
    * cells per member) at the FIRST split level, where cells are coarsest
    * and boundary pairs concentrate, hard below (soft at every level was
    * measured 2^depth membership = 65× wall at a 40× size step; hard
    * everywhere costs recall: 0.64 vs 1.0 at τ=0.45 on sf0.01). Exact
    * cosine verification then runs within leaf cells only: O(n·maxCell·
    * p·softP) total — near-linear in n for fixed maxCell, vs the √n-cell
    * [[semdedupPairs]]'s O(n^1.5). Recall vs the exact twin is re-bounded
    * (not assumed) in ClusteringSpec.
    */
  def semdedupPairsFixed(
      embeddings: DataFrame,
      dim: Int,
      threshold: Double = 0.45,
      maxCell: Int = 512,
      k: Int = 16,
      iterations: Int = 2,
      p: Int = 2,
      softP: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    semdedupPairsFixedWith(embeddings,
      centroids(embeddings, k, iterations, idCol, vecCol),
      dim, threshold, maxCell, k, p, softP, idCol, vecCol)

  /** [[semdedupPairsFixed]] with the coarse centroid set hoisted to the
    * caller — the catalog row passes the centroid set it just computed
    * (and captured for the replay oracle), so the coarse seeding runs
    * exactly once per construction instead of once here and once in the
    * caller's capture.
    */
  def semdedupPairsFixedWith(
      embeddings: DataFrame,
      cents: Array[Seq[Float]],
      dim: Int,
      threshold: Double = 0.45,
      maxCell: Int = 512,
      k: Int = 16,
      p: Int = 2,
      softP: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val soft = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normFixed(col(vecCol), dim).as("nrm"),
        explode(Ivf.topCells(col(vecCol), cents, p)).as("cell0"))
      .withColumn("cluster", col("cell0").cast("long") + 1)
      .drop("cell0")
    pairsWithin(splitOversized(soft, maxCell, k, softP = softP), dim, threshold)
  }
}
