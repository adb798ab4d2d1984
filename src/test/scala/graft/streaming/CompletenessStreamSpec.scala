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

  test("a sealed pulse's state is REMOVED (register-deletion invariant): a " +
      "late drop re-opens from scratch instead of accumulating forever") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DropEvent]
    val query = CompletenessStream(input.toDS())
      .writeStream.format("memory").queryName("pulse_status_seal")
      .outputMode("update").start()
    try {
      // {"0","1"} is a full binary-tree cover → the pulse seals in batch 1
      input.addData(DropEvent(70010L, "0"), DropEvent(70010L, "1"))
      query.processAllAvailable()
      // a late drop AFTER the seal: state was removed at the seal, so the
      // pulse re-opens with exactly one jet — not three accumulated —
      // mirroring the batch path's reload-revokes-completeness semantics
      input.addData(DropEvent(70010L, "10"))
      query.processAllAvailable()
      val rows = spark.table("pulse_status_seal").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getAs[Boolean]("is_complete")))
      assert(rows.contains((70010L, 2, true)), s"never sealed: ${rows.mkString(",")}")
      assert(rows.contains((70010L, 1, false)),
        s"sealed state must be removed, not accumulated: ${rows.mkString(",")}")
      assert(!rows.exists(r => r._1 == 70010L && r._2 == 3),
        s"jets survived the seal: ${rows.mkString(",")}")
    } finally query.stop()
  }
}
