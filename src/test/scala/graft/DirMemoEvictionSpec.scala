package graft

/** The dir-keyed capture registries (k-means centroid capture for the
  * replay oracle, LSH sizing) serve values derived from a dataset
  * GENERATION; this pins the r17 review fix plus the r17 ADVICE
  * extension: they evict on the same RelationCache invalidation signal
  * every other derived cache rides — in BOTH subtree directions (a path
  * under the dir, and an ancestor of the dir) — so a re-ingested corpus
  * recomputes instead of replaying the previous generation's centroid
  * literals or LSH geometry for the JVM's lifetime.
  */
class DirMemoEvictionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dir-keyed registries populate on construction and evict on a " +
      "RelationCache invalidation under the dir") {
    // constructions populate: emb_kmeans → centroid capture;
    // dd_embed_lsh → sizes + corpus count
    Queries.catalog("emb_kmeans")(spark, dir)
    Queries.catalog("dd_embed_lsh")(spark, dir)
    assert(Queries.dirMemoSnapshot(dir) == ((true, true, true)),
      "all three registries must hold the dir after construction")

    // the signal a re-ingest/rewrite broadcasts: a table path UNDER the
    // dataset dir — every dir memo must drop, unrelated dirs must not
    Queries.catalog("dd_embed_lsh")(spark, "/root/testdata/sf0.01")
    graft.sources.RelationCache.invalidate(s"$dir/embeddings.parquet")
    assert(Queries.dirMemoSnapshot(dir) == ((false, false, false)),
      "an invalidated path under the dir must evict its memos")
    assert(Queries.dirMemoSnapshot("/root/testdata/sf0.01")._2,
      "an unrelated dir's memo must survive")

    // repopulation works after eviction (fresh compute, not a crash)
    Queries.catalog("emb_kmeans")(spark, dir)
    assert(Queries.dirMemoSnapshot(dir)._1, "memos repopulate after eviction")
  }

  test("an invalidation ABOVE the dataset dir (wipe-and-rebuild root) " +
      "also evicts — the ancestor direction (ADVICE r17)") {
    Queries.catalog("dd_embed_lsh")(spark, dir)
    assert(Queries.dirMemoSnapshot(dir)._2, "sizes populated")
    // a harness invalidating the ROOT above its dataset dirs: the memo
    // key is a DESCENDANT of the invalidated path
    graft.sources.RelationCache.invalidate("/root/testdata")
    assert(Queries.dirMemoSnapshot(dir) == ((false, false, false)),
      "an ancestor invalidation must evict the dir's memos")
  }
}
