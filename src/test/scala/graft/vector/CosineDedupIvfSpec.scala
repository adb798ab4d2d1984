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

  test("IVF top-k agrees with brute force when probing all cells") {
    val q = Seq(1f, 0.1f, 0f, 0f)
    val brute = Similarity.bruteForceTopK(emb, q, 3)
      .collect().map(_.getLong(0)).toSeq
    val ivf = Ivf.topK(emb, q, 3, nCells = 3, nProbe = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == brute)
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
