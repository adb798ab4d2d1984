package graft

/** The dir-keyed memos (ANN probe vector, k-means centroids, LSH sizing)
  * serve values derived from a dataset GENERATION; this pins the r17
  * review fix: they evict on the same RelationCache invalidation signal
  * every other derived cache rides, so a re-ingested corpus recomputes
  * instead of being probed with the previous generation's vector or
  * clustered on its centroids for the JVM's lifetime.
  */
class DirMemoEvictionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dir-keyed memos populate on construction and evict on a " +
      "RelationCache invalidation under the dir") {
    // constructions populate: ann_topk → probe vector; emb_kmeans →
    // centroid capture; dd_embed_lsh → sizes + corpus count
    Queries.catalog("ann_topk")(spark, dir)
    Queries.catalog("emb_kmeans")(spark, dir)
    Queries.catalog("dd_embed_lsh")(spark, dir)
    assert(Queries.dirMemoSnapshot(dir) == ((true, true, true, true)),
      "all four memos must hold the dir after construction")

    // the signal a re-ingest/rewrite broadcasts: a table path UNDER the
    // dataset dir — every dir memo must drop, unrelated dirs must not
    Queries.catalog("ann_topk")(spark, "/root/testdata/sf0.01")
    graft.sources.RelationCache.invalidate(s"$dir/embeddings.parquet")
    assert(Queries.dirMemoSnapshot(dir) == ((false, false, false, false)),
      "an invalidated path under the dir must evict its memos")
    assert(Queries.dirMemoSnapshot("/root/testdata/sf0.01")._1,
      "an unrelated dir's memo must survive")

    // repopulation works after eviction (fresh compute, not a crash)
    Queries.catalog("emb_kmeans")(spark, dir)
    assert(Queries.dirMemoSnapshot(dir)._2, "memos repopulate after eviction")
  }
}
