package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PaginationPredicatesSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, (i % 10).toLong)).toDF("k1", "k2")
  }

  test("page: deterministic sort + offset + limit") {
    val out = Pagination.page(df, Seq(col("k1").desc), limit = 3, offset = 2)
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(98L, 97L, 96L))
  }

  test("pageWithTotal attaches the filtered total to every row") {
    val filtered = df.filter(col("k1") <= 50)
    val out = Pagination.pageWithTotal(filtered, Seq(col("k1")), limit = 5)
    assert(out.select("total").distinct().collect().map(_.getLong(0)).toSeq == Seq(50L))
    assert(out.count() == 5)
  }

  test("pageWithTotal: empty filtered set yields an empty page, offset applies before total attach") {
    // the broadcast 1-row count must not resurrect a row for an empty page
    assert(Pagination.pageWithTotal(df.filter(col("k1") > 1000), Seq(col("k1")), 5).count() == 0)
    // offset skips rows of the SORTED set; total still counts the whole filter
    val out = Pagination.pageWithTotal(df.filter(col("k1") <= 50), Seq(col("k1")), limit = 3, offset = 48)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((49L, 50L), (50L, 50L)))
  }

  test("limit/offset validation bounds") {
    assert(Pagination.validLimit(1) && Pagination.validLimit(1000))
    assert(!Pagination.validLimit(0) && !Pagination.validLimit(1001))
    assert(Pagination.validOffset(0) && !Pagination.validOffset(-1))
  }

  test("range predicate composes optional bounds") {
    val out = df.filter(Predicates.range(col("k1"), gte = Some(10), lt = Some(13)))
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(10L, 11L, 12L))
    assert(df.filter(Predicates.range(col("k1"))).count() == 100) // no bounds = all
  }

  test("keyset cursor: asc and desc mirror the reference semantics") {
    val asc = df.filter(Predicates.keysetFrom(col("k1"), col("k2"), 99L, 9L, asc = true))
      .collect().map(_.getLong(0)).sorted
    assert(asc.toSeq == Seq(99L, 100L)) // 99 has k2=9 >= 9; 100 has k1>99
    val desc = df.filter(Predicates.keysetFrom(col("k1"), col("k2"), 2L, 2L, asc = false))
      .collect().map(_.getLong(0)).sorted
    assert(desc.toSeq == Seq(1L, 2L))
  }
}
