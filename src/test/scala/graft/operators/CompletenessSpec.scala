package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompletenessSpec extends SparkSpec {

  test("pulseCompleteness: full cover vs partial cover") {
    import spark.implicits._
    val drops = Seq(
      (1L, "0"), (1L, "10"), (1L, "11"), // complete mixed-depth cover
      (2L, "0"), (2L, "10"))             // missing "11" subtree
      .toDF("pulse_number", "jet_id")
    val out = Completeness.pulseCompleteness(drops).orderBy("pulse_number")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(out.toSeq == Seq((1L, true), (2L, false)))
  }

  test("withSequential: running conjunction over pulse order") {
    import spark.implicits._
    val status = Seq((1L, true), (2L, false), (3L, true))
      .toDF("pulse_number", "is_complete")
    val out = Completeness.withSequential(status).orderBy("pulse_number")
      .select("is_sequential").collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, false, false))
  }

  test("missingInRange finds gaps via anti-join") {
    import spark.implicits._
    val present = Seq(10L, 11L, 14L).toDF("pulse_number")
    val out = Completeness.missingInRange(present, "pulse_number", 10L, 15L)
      .orderBy("pulse_number").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(12L, 13L, 15L))
  }
}
