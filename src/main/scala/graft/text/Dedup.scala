package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * Four tiers, all shuffle-shaped for 100 TB:
  *  - exact: one hash-partitioned groupBy on a 64-bit content hash — the
  *    canonical "map-side combine then shuffle tiny digests" pattern; the
  *    full text never shuffles, only (hash, id).
  *  - MinHash + LSH: shingles → K-wide signature → b bands; only band
  *    buckets with >1 member produce candidate pairs, so the self-join is
  *    on bucket keys (bounded fan-out), never all-pairs.
  *  - SimHash: 64-bit near-dup fingerprint; hamming-ball grouping by
  *    rotated prefix bands.
  *  - exact n-gram Jaccard: verification kernel used on LSH candidates.
  *
  * Everything except the SimHash bit-twiddling is pure Catalyst column
  * algebra (codegen'd, null-safe); SimHash is one scalar UDF over a token
  * array.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup: keep the smallest id per identical text. Shuffles only
    * (hash, id) pairs, not the documents.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), xxhash64(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Ids to drop (everything but the keeper of each duplicate class). */
  def exactDropList(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keep = exact(docs, idCol, textCol).filter(col("n_copies") > 1)
    docs.select(col(idCol), xxhash64(col(textCol)).as("content_hash"))
      .join(keep, "content_hash")
      .filter(col(idCol) =!= col("keep_id"))
      .select(col(idCol).as("drop_id"), col("keep_id"))
  }

  // ---------- shingles / n-grams ----------

  /** Normalized word tokens (lowercase, alnum runs). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
  }

  /** Exact Jaccard similarity of two shingle-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  // ---------- MinHash + LSH ----------

  /** K-wide MinHash signature: sig[i] = min over shingles of a seeded
    * 64-bit hash. K independent "permutations" come from hashing the
    * shingle together with the band index — all codegen'd, one pass over
    * the shingle array per signature slot.
    */
  def minhashSignature(shingleCol: Column, k: Int = 32): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleCol, s => xxhash64(s, lit(i))))
    }: _*)

  /** LSH candidate pairs: split the signature into `bands` bands, hash each
    * band, and self-join on (band_index, band_hash). Returns distinct
    * (a_id, b_id) with a_id < b_id, with exact Jaccard attached for
    * verification-threshold filtering.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7
  ): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val sigged = docs
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    val banded = sigged.select(
      col("id"), col("sh"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, rows)), lit(b)).as("bh"))
      }: _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.bh"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        col("a.sh").as("a_sh"), col("b.sh").as("b_sh"))
      .distinct()
      .withColumn("jaccard", jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash of a token array: per-bit vote of per-token hashes. */
  val simhash64: Seq[String] => Long = { toks =>
    val votes = new Array[Int](64)
    toks.foreach { t =>
      var h = scala.util.hashing.MurmurHash3.stringHash(t).toLong & 0xffffffffL
      // widen 32-bit murmur to 64 by mixing with a second seed
      h |= (scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong & 0xffffffffL) << 32
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** SimHash fingerprints: (id, simhash). Near-dups = small hamming
    * distance; group candidates by 16-bit prefix bands (4 rotations) so
    * pairs within hamming distance 3 share at least one band.
    */
  def simhashes(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = udf(simhash64)
    docs.select(col(idCol), sh(tokens(col(textCol))).as("simhash"))
  }

  /** Hamming distance between two long fingerprints (column expr). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a hamming radius via 4×16-bit band LSH. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text", radius: Int = 3): DataFrame = {
    val fp = simhashes(docs, idCol, textCol)
    val banded = fp.select(
      col(idCol).as("id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("bh"))
      }: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.bh"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }
}
