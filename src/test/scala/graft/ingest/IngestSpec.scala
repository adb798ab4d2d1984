package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  private def wire = {
    import spark.implicits._
    Seq(
      // (record_number, id, object_id, jet_id, virtual_type, image, memory, prev_state_id, raw, pulse)
      (1L, "r1", "obj", "0", "activate", "img", "mem", null, "raw1", 70000L),
      (2L, "r2", "obj", "0", "amend", "img", "mem", "r1", "raw2", 70000L),
      (3L, "r3", "obj", "0", "result", null, "mem", null, "raw3", 70000L),
      (4L, "r4", "obj", "0", "unknown_union", null, null, null, "raw4", 70000L),
      (5L, "r5", "", "0", "incoming_request", null, null, null, "raw5", 65536L))
      .toDF("record_number", "ids", "object_ids", "jet_id", "virtual_type",
        "images", "memories", "prev_state_ids", "raws", "pulse_number")
      .select(col("record_number"),
        encode(col("ids"), "UTF-8").as("id"),
        encode(col("object_ids"), "UTF-8").as("object_id"),
        col("jet_id"), col("virtual_type"),
        encode(col("images"), "UTF-8").as("image"),
        encode(col("memories"), "UTF-8").as("memory"),
        encode(col("prev_state_ids"), "UTF-8").as("prev_state_id"),
        encode(col("raws"), "UTF-8").as("raw_data"),
        col("pulse_number"))
  }

  test("canonicalize maps union types, drops unsupported, genesis rewrite") {
    val out = Canonicalize(wire).orderBy("order_hint").collect()
    assert(out.length == 4) // unknown_union dropped
    assert(out.map(_.getAs[String]("type")).toSeq ==
      Seq("state", "state", "result", "request"))
    // amend carries prev ref; activate does not
    assert(out(0).isNullAt(out(0).fieldIndex("prev_record_reference")))
    assert(new String(out(1).getAs[Array[Byte]]("prev_record_reference"), "UTF-8") == "r1")
    // genesis pulse: empty object ref rewritten to the record id
    val genesis = out(3)
    assert(new String(genesis.getAs[Array[Byte]]("object_reference"), "UTF-8") == "r5")
    // result keeps payload, request does not
    assert(new String(out(2).getAs[Array[Byte]]("payload"), "UTF-8") == "mem")
    assert(genesis.isNullAt(genesis.fieldIndex("payload")))
  }

  test("assignOrder is deterministic and dense per (pulse, jet)") {
    import spark.implicits._
    val recs = Seq(
      ("a", 1L, "0", 2L), ("b", 1L, "0", 1L), ("c", 1L, "1", 1L), ("d", 2L, "0", 1L))
      .toDF("ref", "pulse_number", "jet_id", "chain_pos")
      .select(encode(col("ref"), "UTF-8").as("reference"),
        col("pulse_number"), col("jet_id"), col("chain_pos"))
    val out = PulseWriter.assignOrder(recs)
      .select(decode(col("reference"), "UTF-8").as("r"), col("pulse_number"),
        col("jet_id"), col("order"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    assert(out == Set(("b", 1L, "0", 1), ("a", 1L, "0", 2), ("c", 1L, "1", 1), ("d", 2L, "0", 1)))
  }

  test("writePulsePartition is idempotent: rewrite produces identical data") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-test").toString
    val df = Seq((1L, "0", "x"), (1L, "1", "y"), (2L, "0", "z"))
      .toDF("pulse_number", "jet_id", "payload")
    PulseWriter.writePulsePartition(df, "records", tmp)
    val first = storeTable(tmp, "records").collect().map(_.toString).sorted
    PulseWriter.writePulsePartition(df, "records", tmp) // retry / re-delivery
    val second = storeTable(tmp, "records").collect().map(_.toString).sorted
    assert(first.toSeq == second.toSeq,
      "a re-delivered pulse must replace its partition with identical data " +
        "(manifested read — the superseded grace generation is invisible)")
    assert(first.length == 3)
  }

  test("upsertPulses keeps the newest row per pulse") {
    import spark.implicits._
    val existing = Seq((1L, 100L, "old"), (2L, 100L, "keep"))
      .toDF("pulse_number", "ingest_ts", "tag")
    val incoming = Seq((1L, 200L, "new")).toDF("pulse_number", "ingest_ts", "tag")
    val out = PulseWriter.upsertPulses(existing, incoming)
      .orderBy("pulse_number").collect().map(_.getAs[String]("tag"))
    assert(out.toSeq == Seq("new", "keep"))
  }
}
