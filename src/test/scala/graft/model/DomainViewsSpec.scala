package graft.model

import graft.SparkSpec

class DomainViewsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("SQL views serve the block-explorer read surface with pushdown intact") {
    Domain.createViews(spark, dir)
    val page = spark.sql(
      """SELECT reference, pulse_number, `order`
        |FROM records
        |WHERE object_reference = 7 AND type = 'state'
        |ORDER BY pulse_number, `order` LIMIT 20""".stripMargin)
    assert(page.count() > 0)
    val drops = spark.sql(
      "SELECT count(*) AS n FROM jet_drops WHERE jet_id = '010'").collect().head.getLong(0)
    assert(drops > 0)
    // sf0.001 is sparse enough that no pulse covers all 8 jets, so assert
    // the dimension itself (completeness truth is oracled at sf0.01)
    val pulses = spark.sql(
      "SELECT count(*) FROM pulses WHERE record_amount > 0").collect().head.getLong(0)
    assert(pulses > 0)
    // native functions ride along on the same session
    val fp = spark.sql(
      "SELECT fnv_fingerprint(jet_id) FROM jet_drops LIMIT 1").collect().head.getLong(0)
    assert(fp != 0L)
    // pushdown property: the views serve the materialized spine, so the
    // object filter reaches the spine scan's PushedFilters LIST (a view
    // over the lazy builder could never push past its window). "plan
    // contains 'PushedFilters'" alone would be vacuous — every parquet
    // scan prints the header even when the list is empty.
    val plan = page.queryExecution.executedPlan.toString
    assert("""PushedFilters: \[[^\]]*EqualTo\(object_reference,7\)""".r
      .findFirstIn(plan).isDefined,
      s"object filter must push to the spine scan through the view:\n$plan")
  }

  test("the materialized spine serves exactly the lazy views' rows (parquet round-trip)") {
    // the serving artifacts are a pure materialization: same rows, same
    // values, bit-for-bit — this is what keeps every be_* oracle valid
    // after the read path switched from the lazy views to the spine
    def canon(df: org.apache.spark.sql.DataFrame) = {
      val cols = df.columns.sorted.map(org.apache.spark.sql.functions.col)
      df.select(cols: _*).orderBy(cols: _*).collect().toSeq
    }
    val lazyRecords = Domain.records(spark, dir)
    assert(canon(Domain.servedRecords(spark, dir)) == canon(lazyRecords))
    assert(canon(Domain.servedJetDrops(spark, dir)) == canon(Domain.jetDrops(lazyRecords)))
    assert(canon(Domain.servedPulses(spark, dir)) == canon(Domain.pulses(lazyRecords)))
  }

  test("pulses.jet_drop_amount equals the pulse's SAVED drop count, including " +
      "merged pulses (the jet-merge coarsening applies to both sides)") {
    import org.apache.spark.sql.functions._
    // the reference increments the counter once per saved jet drop — the
    // drop LIST is the truth; on a merged pulse (every 4th) the raw
    // record jets would over-count (8 leaves vs 4 merged drops)
    val records = Domain.records(spark, dir)
    val fromDrops = Domain.jetDrops(records)
      .groupBy("pulse_number").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromPulses = Domain.pulses(records)
      .select(col("pulse_number"), col("jet_drop_amount"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromPulses == fromDrops,
      s"counter disagrees with the drop list: ${
        fromPulses.collect { case (p, n) if fromDrops.get(p) != Some(n) =>
          s"$p: counter=$n drops=${fromDrops.get(p)}" }.mkString("; ")}")
    // the corpus actually exercises the merge case
    assert(fromPulses.keys.exists(_ % 4 == 0), "no merged pulse in the corpus")
  }
}
