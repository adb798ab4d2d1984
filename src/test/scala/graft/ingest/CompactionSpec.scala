package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def store(): String =
    java.nio.file.Files.createTempDirectory("graft-compact").toString + "/records"

  private def appendPulse(path: String, pulse: Long, nFiles: Int): Unit = {
    import spark.implicits._
    (0 until nFiles).foreach { f =>
      (0 until 10).map(i => (pulse, s"jet$f", f * 10 + i + 1, s"r-$pulse-$f-$i"))
        .toDF("pulse_number", "jet_id", "order", "reference")
        .coalesce(1).write.mode("append").partitionBy("pulse_number").parquet(path)
    }
  }

  test("compact merges many small per-commit files into one per partition") {
    val path = store()
    appendPulse(path, 70000L, 5)
    appendPulse(path, 70010L, 3)
    appendPulse(path, 70020L, 1) // already compact — must not be touched

    val before = spark.read.parquet(path).orderBy(col("pulse_number"), col("jet_id"), col("order"))
      .collect().map(_.toString).toSeq
    val cands = Compaction.candidates(spark, path)
    assert(cands.map(c => c.partition -> c.files).toMap ==
      Map("pulse_number=70000" -> 5, "pulse_number=70010" -> 3))

    val (parts, filesBefore, filesAfter) = Compaction.compact(spark, path)
    assert(parts == 2 && filesBefore == 8 && filesAfter == 2)

    // same rows, untouched partition intact
    val after = spark.read.parquet(path).orderBy(col("pulse_number"), col("jet_id"), col("order"))
      .collect().map(_.toString).toSeq
    assert(after == before)

    // idempotent: second run finds nothing
    assert(Compaction.compact(spark, path) == (0, 0, 0))
  }

  test("a MANIFESTED store compacts through the snapshot protocol: " +
      "candidates count current files only, the rewrite publishes a new " +
      "version, rows are identical, and a second run is a no-op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact-m").toString
    // five manifested single-file pulse commits, each its own partition
    (0 until 5).foreach { f =>
      PulseWriter.writePulsePartition(
        (0 until 10).map(i => (90000L + f * 10, s"jet$f", i + 1, s"r-$f-$i"))
          .toDF("pulse_number", "jet_id", "order", "reference"),
        "records", base, pulses = Some(Seq(90000L + f * 10)))
    }
    val path = s"$base/records"
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // make one partition hold several CURRENT files (3-file re-commits),
    // leaving a superseded grace generation on disk beside them
    (0 until 4).foreach { f =>
      PulseWriter.writePulsePartition(
        (0 until 10).map(i => (90000L, s"x$f", f * 10 + i + 1, s"q-$f-$i"))
          .toDF("pulse_number", "jet_id", "order", "reference")
          .repartition(3), // 3 files per commit
        "records", base, pulses = Some(Seq(90000L)))
    }
    val snapBefore = TableManifest.latest(fsys, path).get
    val current = snapBefore.partitions("pulse_number=90000").length
    val onDisk = TableManifest.listPartitionFiles(fsys, path, "pulse_number=90000").size
    assert(onDisk > current, "a grace generation must be on disk for the test to bite")
    val cand = Compaction.candidates(spark, path)
      .find(_.partition == "pulse_number=90000").get
    assert(cand.files == current,
      "candidates must count the manifest's files, not the grace generation")
    val rowsBefore = storeTable(base, "records")
      .orderBy(col("pulse_number"), col("jet_id"), col("order"))
      .collect().map(_.toString).toSeq
    val (parts, _, after) = Compaction.compact(spark, path)
    assert(parts >= 1 && after <= parts, s"parts=$parts after=$after")
    val snapAfter = TableManifest.latest(fsys, path).get
    assert(snapAfter.version == snapBefore.version + 1)
    assert(snapAfter.partitions("pulse_number=90000").length == 1)
    val rowsAfter = storeTable(base, "records")
      .orderBy(col("pulse_number"), col("jet_id"), col("order"))
      .collect().map(_.toString).toSeq
    assert(rowsAfter == rowsBefore, "compaction must not change served rows")
    assert(Compaction.compact(spark, path) == ((0, 0, 0)), "second run is a no-op")
  }

  test("oversized partitions split into ceil(bytes/target) files deterministically") {
    val path = store()
    appendPulse(path, 80000L, 4)
    val bytes = Compaction.candidates(spark, path, maxFiles = 0).head.bytes
    // force a 2-file target
    val target = bytes / 2 + 1
    val (_, _, after) = Compaction.compact(spark, path, targetFileBytes = target)
    assert(after == 2)
    val rows = spark.read.parquet(path).count()
    assert(rows == 40)
    // a partition sitting AT its multi-file target is no longer a
    // candidate: re-running must be a no-op, not an eternal rewrite of
    // every partition that legitimately needs n>1 files
    assert(Compaction.compact(spark, path, targetFileBytes = target) == ((0, 0, 0)),
      "a correctly-sized multi-file partition must not be re-compacted")
  }
}
