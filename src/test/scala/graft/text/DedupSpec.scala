package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home " * 4

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, base),
      (2L, base), // exact duplicate of 1
      (3L, base.replace("lazy", "sleepy")), // near-duplicate
      (4L, "completely different text about spark engines and columnar formats"),
      (5L, "another unrelated document mentioning catalyst and tungsten at scale"))
      .toDF("doc_id", "text")
  }

  test("ngramScaleStats measures the exact candidate-pair volume " +
      "(sum of C(df,2)) and the advisory fires only when collisions " +
      "dominate the corpus") {
    import spark.implicits._
    // hand-built capped shingle rows: shingle A in 3 docs, B in 2, C in 1
    // → candidate pairs = C(3,2)+C(2,2)+C(1,2) = 3+1+0 = 4
    val capped = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (2L, 20L),
      (3L, 30L)).toDF("doc_id", "sh")
    val st = Dedup.ngramScaleStats(capped, "sh", nDocs = 3L)
    assert(st.distinctShingles == 3 && st.candidatePairs == 4.0)
    assert(math.abs(st.pairsPerDoc - 4.0 / 3) < 1e-12)
    // the catalog advisory (thresholds lowered to unit scale): a corpus
    // whose shingle space is tiny against it fires; a diverse one and
    // anything under minDocs stay silent
    assert(graft.Queries.ngramScaleAdvisory(capped, nDocs = 3,
      minDocs = 1, pairsPerDoc = 1.0).isDefined, "collision-dominated corpus must fire")
    val diverse = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "sh")
    assert(graft.Queries.ngramScaleAdvisory(diverse, nDocs = 3,
      minDocs = 1, pairsPerDoc = 1.0).isEmpty, "no shared shingles → silent")
    assert(graft.Queries.ngramScaleAdvisory(capped, nDocs = 3,
      minDocs = 1000, pairsPerDoc = 1.0).isEmpty,
      "below minDocs the advisory runs no measurement at all")
    // an empty capped stream (everything df-capped away) must not throw
    val none = Dedup.ngramScaleStats(capped.filter(col("doc_id") < 0), "sh", 0L)
    assert(none.distinctShingles == 0 && none.candidatePairs == 0.0)
  }

  test("exact dedup groups identical texts and keeps the smallest id") {
    val classes = Dedup.exact(docs)
    assert(classes.count() == 4)
    val dupClass = classes.filter(col("n_copies") === 2).collect()
    assert(dupClass.length == 1 && dupClass(0).getAs[Long]("keep_id") == 1L)
    val drops = Dedup.exactDropList(docs).collect()
    assert(drops.length == 1 && drops(0).getAs[Long]("drop_id") == 2L)
  }

  test("incremental dedup flags corpus dups, batch dups, and keepers") {
    import spark.implicits._
    val idxPath = java.nio.file.Files.createTempDirectory("graft-hashidx").toString + "/idx"
    val corpus = Seq((100L, base), (101L, "corpus only text body")).toDF("doc_id", "text")
    Dedup.ensureHashIndex(corpus, idxPath)
    val batch = Seq(
      (1L, base), // dup of corpus 100
      (2L, "fresh batch document one"),
      (3L, "fresh batch document one"), // dup within batch of 2
      (4L, "fresh batch document two"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalVerdicts(batch, idxPath)
      .orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 0L), // corpus dup
      (2L, 0L, 0L, 1L), // first of its class in the batch → keep
      (3L, 0L, 1L, 0L), // later same-hash batch doc
      (4L, 0L, 0L, 1L)))
    // the index is standing: a second ensure must not rebuild (same keeper)
    Dedup.ensureHashIndex(batch, idxPath) // would change keepers if it rewrote
    assert(graft.sources.RelationCache.parquet(spark, idxPath).count() == 2)
  }

  test("shingleRows matches the array-form shingles") {
    import spark.implicits._
    val rel = Dedup.shingleRows(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val arr = docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rel == arr)
  }

  test("native shingle-hash kernel mirrors the relational string pipeline") {
    // Same multiset structure: per (doc, distinct-shingle) cardinalities
    // must agree with the string form (the hash is a bijection modulo
    // 64-bit collisions), including texts shorter than n (no rows) and
    // punctuation/case normalization.
    import spark.implicits._
    val tricky = docs.union(Seq(
      (6L, "Two words"),
      (7L, "  PUNCT!!! heavy--text,,with??many10separators  "),
      (8L, "one two one two one two")).toDF("doc_id", "text"))
    val viaString = Dedup.shingleRows(tricky, "doc_id", "text", 3)
      .groupBy(col("id")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaKernel = Dedup.shingleHashRows(tricky, "doc_id", "text", 3).distinct()
      .groupBy(col("id")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaString)
    // occurrence (raw) counts agree too — the minhash signature reads raw
    val rawString = Dedup.shingleRowsRaw(tricky, "doc_id", "text", 3)
      .groupBy(col("id")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rawKernel = Dedup.shingleHashRows(tricky, "doc_id", "text", 3)
      .groupBy(col("id")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rawKernel == rawString)
    // order sensitivity: distinct hash count of doc 8 ("one two one ...")
    // must reflect BOTH rotations ("one two one", "two one two")
    assert(viaKernel(8L) == 2L)
    // null text → null array → no rows after explode (not a crash, not
    // an empty-string shingle); empty text → no rows
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(9L, null.asInstanceOf[String]),
        org.apache.spark.sql.Row(10L, ""),
        org.apache.spark.sql.Row(11L, "a b c")),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val ids = Dedup.shingleHashRows(withNull, "doc_id", "text", 3)
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(11L))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => b == 4L || b == 5L || a == 4L || a == 5L })
  }

  test("minhash exact-duplicate pair has jaccard 1.0") {
    val j = Dedup.minhashPairs(docs, threshold = 0.5)
      .filter(col("a_id") === 1L && col("b_id") === 2L)
      .collect()(0).getAs[Double]("jaccard")
    assert(j == 1.0)
  }

  test("simhash: identical texts share fingerprints; near-dups within radius") {
    val fps = Dedup.simhashes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    val pairs = Dedup.simhashPairs(docs, radius = 8)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhashPairs excludes token-less documents: no quadratic hamming-0 " +
      "pairing of empty/markup-only docs (oracle emits no signature for them)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "real content here"), (2L, "real content here"),
      (3L, "   "), (4L, "!!! ---"), (5L, "\n\t"), (6L, "")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, radius = 3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs == Set((1L, 2L)),
      s"token-less docs must not pair (they all fingerprint to 0): $pairs")
  }

  test("jaccard column function on known sets") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
  }
}
