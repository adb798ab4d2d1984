package graft

import org.apache.spark.sql.functions._

/** Pins the r18 dd_ngram_jaccard planning trim: the df-cap's hot set,
  * resolved at construction into an InSet filter (which removes six
  * inlined aggregate+broadcast subtrees from the pair query's plan),
  * must produce the IDENTICAL capped shingle set as the anti-join form
  * it replaces — on a corpus engineered so the cap actually fires —
  * and must fall back to the anti-join when the hot set outgrows the
  * inline bound, again identically.
  */
class NgramCapEquivalenceSpec extends SparkSpec {

  // ShingleK = 3 word shingles: "stop stop stop" appears in every doc
  // (df = 6 > maxDf = 2, capped); each doc keeps a unique tail shingle.
  private def docs = {
    import spark.implicits._
    (0L until 6L).map(i => (i, s"stop stop stop unique$i tail$i word$i"))
      .toDF("doc_id", "text")
  }

  private def collectSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id"), col("sh")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("the InSet form and the anti-join fallback produce the identical " +
      "capped set, and the cap provably fired") {
    val uncapped = collectSet(Queries.cappedShinglesWith(docs, maxDf = 1000, maxInline = 1000))
    val inlined = collectSet(Queries.cappedShinglesWith(docs, maxDf = 2, maxInline = 1000))
    val antiJoin = collectSet(Queries.cappedShinglesWith(docs, maxDf = 2, maxInline = 0))
    assert(inlined == antiJoin, "both cap forms must keep the same rows")
    assert(inlined.size < uncapped.size, "the cap must have removed hot shingles")
    // every doc keeps its unique shingles, none keeps a df>2 one
    val dfBySh = uncapped.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = uncapped.filter { case (_, sh) => dfBySh(sh) <= 2 }
    assert(inlined == expected, "capped set = rows whose shingle df <= maxDf, exactly")
  }

  test("an empty hot set (no shingle over the cap) keeps the stream " +
      "untouched with no filter at all") {
    val base = collectSet(Queries.cappedShinglesWith(docs, maxDf = 1000, maxInline = 1000))
    assert(base.nonEmpty)
  }

  test("the plans differ exactly as designed: the inline form carries no " +
      "anti-join, the fallback form does") {
    val inlined = Queries.cappedShinglesWith(docs, maxDf = 2, maxInline = 1000)
      .queryExecution.executedPlan.toString
    val antiJoin = Queries.cappedShinglesWith(docs, maxDf = 2, maxInline = 0)
      .queryExecution.executedPlan.toString
    assert(!inlined.contains("LeftAnti"),
      s"inline form must filter, not join:\n$inlined")
    assert(antiJoin.contains("LeftAnti"),
      s"fallback must keep the anti-join shape:\n$antiJoin")
  }
}
