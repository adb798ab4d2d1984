package graft.vector

import graft.SparkSpec

/** Pins the fingerprinted index-root contract: changed source data moves
  * the root (stale indexes can never be served silently), while within
  * the TTL the resolution is served from cache — the serving path must
  * not pay a source-dir LIST per request.
  */
class IndexRootSpec extends SparkSpec {

  private def writeCorpus(dir: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("indexRoot is cached within the TTL and re-fingerprints after it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-root").toString
    val savedTtl = AnnIndex.rootTtlNanos
    try {
      AnnIndex.rootTtlNanos = 60L * 1000000000L
      writeCorpus(dir, 10)
      val root1 = AnnIndex.indexRoot(dir)
      // changed data, live TTL: the cached resolution is served — this is
      // the amortized serving path (no LIST per request)
      writeCorpus(dir, 999)
      assert(AnnIndex.indexRoot(dir) == root1,
        "within the TTL the root must come from cache, not a fresh listing")
      // expired TTL: the changed fingerprint must move the root, so the
      // regenerated corpus rebuilds instead of serving the stale index
      AnnIndex.rootTtlNanos = 0L
      val root2 = AnnIndex.indexRoot(dir)
      assert(root2 != root1,
        "after the TTL a regenerated corpus must resolve to a new root")
      assert(AnnIndex.indexRoot(dir) == root2, "re-listing must be deterministic")
    } finally AnnIndex.rootTtlNanos = savedTtl
  }

  test("distinct corpora resolve to distinct roots under one scratch dir") {
    val a = java.nio.file.Files.createTempDirectory("graft-root-a").toString
    val b = java.nio.file.Files.createTempDirectory("graft-root-b").toString
    writeCorpus(a, 10)
    writeCorpus(b, 10)
    assert(AnnIndex.indexRoot(a) != AnnIndex.indexRoot(b))
  }
}
