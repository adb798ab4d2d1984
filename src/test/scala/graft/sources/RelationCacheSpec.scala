package graft.sources

import graft.SparkSpec

/** Pins the resolved-relation cache semantics the serving layer and the
  * artifact commit protocol both lean on: repeated reads reuse one
  * resolved relation (no per-call file listing), and invalidation is
  * subtree-scoped with path-component boundaries (rewriting an artifact
  * root must evict its nested datasets but never a sibling whose name
  * merely extends the prefix).
  */
class RelationCacheSpec extends SparkSpec {

  private def writeN(path: String, n: Int): Unit = {
    import spark.implicits._
    (1 to n).toDF("x").coalesce(1).write.mode("overwrite").parquet(path)
  }

  test("repeated reads return the cached relation; invalidate forces re-resolution") {
    val root = java.nio.file.Files.createTempDirectory("graft-rel").toString
    val path = s"$root/t"
    writeN(path, 3)
    val first = RelationCache.parquet(spark, path)
    assert(RelationCache.parquet(spark, path) eq first,
      "a second read must reuse the resolved relation, not re-list the files")
    // rewrite + invalidate: the stale file index must not survive
    writeN(path, 7)
    RelationCache.invalidate(path)
    val re = RelationCache.parquet(spark, path)
    assert(!(re eq first), "invalidate must drop the cached relation")
    assert(re.count() == 7, "the re-resolved relation must see the rewritten files")
  }

  test("entries are keyed per session: a clone resolves its own relation") {
    val root = java.nio.file.Files.createTempDirectory("graft-rel").toString
    val path = s"$root/t"
    writeN(path, 3)
    val mine = RelationCache.parquet(spark, path)
    val clone = spark.newSession()
    val theirs = RelationCache.parquet(clone, path)
    assert(!(theirs eq mine),
      "a different session must never be handed another session's relation")
    assert(RelationCache.parquet(clone, path) eq theirs,
      "...but must reuse its OWN cached relation")
  }

  test("invalidate is subtree-scoped with component boundaries") {
    val root = java.nio.file.Files.createTempDirectory("graft-rel").toString
    val (parent, child, sibling) = (s"$root/idx", s"$root/idx/vectors", s"$root/idx2")
    writeN(child, 2)
    writeN(sibling, 4)
    val childRel = RelationCache.parquet(spark, child)
    val siblingRel = RelationCache.parquet(spark, sibling)
    RelationCache.invalidate(parent)
    assert(!(RelationCache.parquet(spark, child) eq childRel),
      "a nested dataset must be evicted with its artifact root")
    assert(RelationCache.parquet(spark, sibling) eq siblingRel,
      "a sibling whose name extends the prefix must keep its cached relation")
  }
}
