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
