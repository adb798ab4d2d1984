package graft.ingest

import graft.SparkSpec
import graft.model.Domain
import org.apache.spark.sql.functions._

class LifelineLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("object-bucketed layout returns the same lifeline as the primary store, pruned") {
    val records = Domain.records(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-lifeline").toString + "/records_by_object"
    LifelineLayout.write(records, path)

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("reference").cast("long"), col("pulse_number").cast("long"),
        col("order").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val primary = rows(records.filter(col("object_reference") === 7L && col("type") === "state"))
    val indexed = rows(LifelineLayout.lifeline(spark, path, 7L).filter(col("type") === "state"))
    assert(indexed == primary, "secondary layout must return identical rows")

    // the scale property: the bucket predicate is a PARTITION filter
    val plan = LifelineLayout.lifeline(spark, path, 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("obj_bucket"),
      s"bucket equality must prune partitions:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("object_reference"),
      "object equality must push to row groups")
  }

  test("bucketOf matches the column-side pmod for negative refs too") {
    assert(LifelineLayout.bucketOf(7L) == 7L)
    assert(LifelineLayout.bucketOf(263L) == 7L)
    assert(LifelineLayout.bucketOf(-1L) == 255L)
  }
}
