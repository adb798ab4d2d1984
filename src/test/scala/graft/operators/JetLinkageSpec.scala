package graft.operators

import graft.SparkSpec
import graft.model.Domain
import org.apache.spark.sql.functions._

class JetLinkageSpec extends SparkSpec {

  test("siblingsAround at the Domain cadence (delta 1) finds parent/self/children at pulse±1") {
    val drops = Domain.jetDrops(Domain.records(spark, "/root/testdata/sf0.001"))
    // pick a pulse whose predecessor carries jet 010 (the sf0.001 chain
    // has gaps and sparse pulses, so search rather than assume density)
    val present = drops.filter(col("jet_id") === "010")
      .select("pulse_number").collect().map(_.getLong(0)).toSet
    val p = present.find(p => present(p - 1)).get
    val out = JetLinkage.siblingsAround(drops, p, "010").collect()
    assert(out.nonEmpty, "the adjacent same-jet drop must be found at the hourly cadence")
    assert(out.forall(r => Set(p - 1, p + 1)(r.getAs[Long]("pulse_number"))))
    assert(out.forall(r => Set("010", "0100", "0101", "01")(r.getAs[String]("jet_id"))))
    assert(out.exists(r => r.getAs[Long]("pulse_number") == p - 1 &&
      r.getAs[String]("jet_id") == "010"))
  }

  test("jet merges carry TWO parent hashes and hash-link both (J5 merge branch)") {
    val drops = Domain.jetDrops(Domain.records(spark, "/root/testdata/sf0.001"))
      .withColumn("jet_drop_id",
        graft.functions.Codecs.jetDropIdString(col("jet_id"), col("pulse_number")))
    // A merge-pulse drop (pulse % 4 == 0, depth-2 jet) whose two depth-3
    // children both exist one pulse back.
    val merged = drops.filter(col("second_prev_hash").isNotNull)
    assert(merged.count() > 0, "merge pulses must produce two-parent drops")
    val all = drops.select("pulse_number", "jet_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val m = merged.select("pulse_number", "jet_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .find { case (p, j) => all((p - 1, j + "0")) && all((p - 1, j + "1")) }
    assert(m.isDefined, "need a merged drop with both children present at pulse-1")
    val (p, j) = m.get
    val page = drops.filter(col("pulse_number") === p && col("jet_id") === j)
    val neighbors = drops.filter(col("pulse_number").between(p - 1, p + 1))
    val prevIds = JetLinkage.hashLinkIds(page, neighbors)
      .select("prev_ids").collect().head.getString(0).split(",").toSet
    // child0 matches via first_prev_hash, child1 ONLY via second_prev_hash —
    // the branch that was dead code while second_prev_hash was always null
    assert(prevIds.contains(s"$j" + "0:" + (p - 1)), s"first-parent link missing: $prevIds")
    assert(prevIds.contains(s"$j" + "1:" + (p - 1)), s"second-parent link missing: $prevIds")
  }

  test("siblingsAround at the reference cadence (delta 10) over the jet split tree") {
    val tree = graft.gen.Fixtures.jetSplitTree(spark, rootJet = "01", nPulses = 3)
    val mid = graft.gen.Fixtures.GenesisPulse + 2 * graft.gen.Fixtures.PulseDelta
    val out = JetLinkage.siblingsAround(tree, mid, "010", pulseDelta = graft.gen.Fixtures.PulseDelta)
      .select(col("pulse_number"), col("jet_id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // parent "01" one pulse back; children "0100"/"0101" one pulse forward
    assert(out == Set(
      (mid - 10, "01"),
      (mid + 10, "0100"),
      (mid + 10, "0101")))
  }
}
