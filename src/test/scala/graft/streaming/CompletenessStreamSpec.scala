package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import CompletenessStream.DropEvent

class CompletenessStreamSpec extends SparkSpec {

  test("stateful completeness flips exactly when the jet cover closes (ST2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DropEvent]
    val query = CompletenessStream(input.toDS())
      .writeStream.format("memory").queryName("pulse_status")
      .outputMode("update").start()
    try {
      // batch 1: half the tree for pulse 70010 → incomplete
      input.addData(DropEvent(70010L, "0"), DropEvent(70010L, "10"))
      query.processAllAvailable()
      val b1 = spark.table("pulse_status").collect()
      assert(b1.length == 1)
      assert(!b1(0).getAs[Boolean]("is_complete") && b1(0).getAs[Int]("jet_count") == 2)

      // batch 2: the missing subtree arrives (state carried across batches)
      input.addData(DropEvent(70010L, "11"), DropEvent(70020L, "1"))
      query.processAllAvailable()
      val rows = spark.table("pulse_status").collect()
        .map(r => (r.getLong(0), r.getAs[Boolean]("is_complete"), r.getInt(1)))
      // latest verdict for 70010: complete with 3 jets accumulated
      assert(rows.contains((70010L, true, 3)))
      // 70020 has only half the tree → incomplete
      assert(rows.contains((70020L, false, 1)))
    } finally query.stop()
  }
}
