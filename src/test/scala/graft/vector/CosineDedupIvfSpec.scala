package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineDedupIvfSpec extends SparkSpec {

  // 4-dim corpus: 1≈2 (near-dup), 3 unrelated, 4 opposite, plus axis vecs
  private def emb = {
    import spark.implicits._
    Seq(
      (1L, Seq(1f, 0.1f, 0f, 0f)),
      (2L, Seq(1f, 0.12f, 0.01f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0.2f)),
      (4L, Seq(-1f, -0.1f, 0f, 0f)),
      (5L, Seq(0f, 1f, 0f, 0f)),
      (6L, Seq(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
  }

  test("exact cosine pairs find the planted near-duplicate only") {
    val pairs = CosineDedup.exactPairs(emb, dim = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("LSH pairs are a subset of exact pairs and catch the near-dup") {
    val exact = CosineDedup.exactPairs(emb, dim = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = CosineDedup.lshPairs(emb, dim = 4, threshold = 0.9, bits = 2, tables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((1L, 2L))) // 6 tables of 2 bits: miss probability ~0
  }

  test("lshPairsAuto sizes the signature with the corpus and keeps the " +
      "subset + recall contract of the fixed-parameter path") {
    val exact = CosineDedup.exactPairs(emb, dim = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val auto = CosineDedup.lshPairsAuto(emb, dim = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.subsetOf(exact) && auto.contains((1L, 2L)))
    // the saturation defect the sf1 curve measured: fixed bits hold the
    // bucket count constant while n grows, so in-bucket pairs (the
    // candidate cost) grow quadratically — auto sizing must WIDEN the
    // signature as the corpus grows
    val small = CosineDedup.bitsFor(1000L, 0.45)
    val big = CosineDedup.bitsFor(100000L, 0.45)
    assert(big > small, s"bits must grow with n: n=1e3→$small, n=1e5→$big")
    // and the modeled candidate volume per vector stays bounded: buckets
    // scale with n up to the table-count tradeoff the cost model makes
    assert(math.pow(2, big) >= 100000L / 64,
      s"bucket count must track the corpus: 2^$big buckets for 1e5 vectors")
  }

  test("bitsFor's argmin is stable under ±4x mis-calibration of its two " +
      "cost constants (the comment's sensitivity table, asserted)") {
    // the (500, 60) units are coarsely fitted to one box; the sizing
    // only has to RANK 21 integer choices, so the claim worth pinning is
    // graceful degradation: across the whole ±4x grid the argmin moves
    // at most 3 bits, and the baseline choice COSTED UNDER the perturbed
    // weights stays within 2x of that weight set's own optimum
    val grid = for {
      su <- Seq(125.0, 500.0, 2000.0)
      pu <- Seq(15.0, 60.0, 240.0)
    } yield (su, pu)
    for (n <- Seq(5000L, 500000L, 50000000L, 5000000000L)) {
      val base = CosineDedup.bitsFor(n, 0.45, 0.97)
      for ((su, pu) <- grid) {
        val opt = CosineDedup.bitsFor(n, 0.45, 0.97, 64, su, pu)
        assert(math.abs(opt - base) <= 3,
          s"n=$n weights=($su,$pu): argmin $opt vs baseline $base moved >3 bits")
        val degr = CosineDedup.modeledCost(n, 0.45, 0.97, 64, base, su, pu) /
          CosineDedup.modeledCost(n, 0.45, 0.97, 64, opt, su, pu)
        assert(degr <= 2.0,
          s"n=$n weights=($su,$pu): baseline bits cost ${degr}x the optimum")
      }
    }
    // the comment's spot values stay honest
    assert(CosineDedup.bitsFor(5000L, 0.45, 0.97) == 7)
    assert(CosineDedup.bitsFor(500000L, 0.45, 0.97) == 14)
    assert(CosineDedup.bitsFor(5000000000L, 0.45, 0.97) == 24)
  }

  test("IVF top-k agrees with brute force when probing all cells") {
    val q = Seq(1f, 0.1f, 0f, 0f)
    val brute = Similarity.bruteForceTopK(emb, q, 3)
      .collect().map(_.getLong(0)).toSeq
    val ivf = Ivf.topK(emb, q, 3, nCells = 3, nProbe = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == brute)
  }

  test("refineCentroids converges to unit-norm cluster means on clustered data") {
    import spark.implicits._
    // two tight clusters around orthogonal axes
    val clustered = ((1 to 20).map(i => (i.toLong, Seq(1f, 0.01f * i, 0f, 0f))) ++
      (21 to 40).map(i => (i.toLong, Seq(0f, 0f, 1f, 0.01f * (i - 20)))))
      .toDF("vec_id", "embedding")
    val seed = Ivf.centroids(clustered, 2)
    val refined = Ivf.refineCentroids(clustered, seed, iterations = 3)
    assert(refined.length == 2)
    refined.foreach { c =>
      val n = math.sqrt(c.map(v => v.toDouble * v).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"refined centroid must be unit-norm, got $n")
    }
    // each cluster's dominant axis is dominant in exactly one centroid
    val axes = refined.map(_.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes == Set(0, 2), s"centroids must settle on the two cluster axes: $axes")
  }

  test("IVF pruning searches fewer rows but still finds the close neighbor") {
    val q = Seq(1f, 0.1f, 0f, 0f)
    val cents = Ivf.centroids(emb, nCells = 3)
    assert(cents.length == 3)
    val assigned = emb.withColumn("cell", Ivf.cellOf(col("embedding"), cents))
    // every vector lands in exactly one of the 3 cells
    val cells = assigned.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf(Set(0, 1, 2)))
    val top = Ivf.topK(emb, q, 1, nCells = 3, nProbe = 1).collect()
    assert(top.nonEmpty)
    // the probed cell contains the query's own nearest centroid-mates; the
    // top hit must be one of the two near-parallel vectors
    assert(Set(1L, 2L).contains(top(0).getLong(0)))
  }
}
