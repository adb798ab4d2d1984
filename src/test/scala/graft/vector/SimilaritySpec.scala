package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def emb = {
    import spark.implicits._
    Seq(
      (0L, Seq(1f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f)),   // identical to query
      (2L, Seq(0.9f, 0.1f, 0f)), // close
      (3L, Seq(0f, 1f, 0f)),   // orthogonal
      (4L, Seq(-1f, 0f, 0f)),  // opposite
      (5L, Seq(0f, 0f, 0f)))   // zero vector
      .toDF("vec_id", "embedding")
  }

  test("cosine column: known geometry") {
    import spark.implicits._
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f)), (Seq(1f, 1f), Seq(1f, 1f)),
      (Seq(1f, 0f), Seq(0f, 0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(out(0) == 0.0)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(out(2) == 0.0) // zero vector guarded
  }

  test("bruteForceTopK ranks by cosine with id tiebreak") {
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0L), Seq(1f, 0f, 0f), 3)
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("topKJoin returns k neighbors per query row") {
    val queries = emb.filter(col("vec_id").isin(0L, 3L))
    val out = Similarity.topKJoin(emb, queries, k = 2)
    val byQuery = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 3L))
    assert(byQuery.values.forall(_.length == 2))
    // neighbor ranking for query 0: vec 1 (identical) first
    assert(byQuery(0L).minBy(_.getAs[Int]("rank")).getAs[Long]("neighbor_id") == 1L)
  }

  test("lshTopK results are a subset of brute-force ordering semantics") {
    val q = Seq(1f, 0f, 0f)
    val brute = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0L), q, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(emb.filter(col("vec_id") =!= 0L), q, 5, bits = 4)
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val id = r.getLong(0)
      assert(brute.contains(id))
      assert(math.abs(brute(id) - r.getDouble(1)) < 1e-12)
    }
  }
}
