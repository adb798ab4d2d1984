package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for the pulse-partitioned store.
  *
  * Each pulse commit writes its own files; at the reference's ~10 s
  * cadence a year of ingest is ~3 M partitions and the per-(pulse, jet)
  * commit pattern leaves many KB-sized files per partition. At 100 TB
  * that is the classic small-files failure: scan throughput collapses to
  * file-open overhead and the namenode/listing layer becomes the
  * bottleneck. A maintenance-window compactor rewrites the affected
  * partitions into few large files — same rows, same layout contract
  * (sorted by (jet_id, order) for row-group pruning), same idempotent
  * partition-overwrite commit the writer uses, so a crashed compaction
  * retries to a byte-identical result.
  *
  * The scan of candidate partitions is driver-side FS listing (cheap, the
  * same listing a FileIndex does); the rewrite is a narrow per-partition
  * job — no shuffle unless `targetFileBytes` forces a split.
  */
object Compaction {

  final case class PartitionStat(partition: String, files: Int, bytes: Long)

  /** Partitions under `tablePath` with more than `maxFiles` data files —
    * the compaction candidates.
    */
  def candidates(
      spark: SparkSession,
      tablePath: String,
      maxFiles: Int = 1
  ): Seq[PartitionStat] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { dir =>
        val data = fs.listStatus(dir.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        PartitionStat(dir.getPath.getName, data.length, data.map(_.getLen).sum)
      }
      .filter(_.files > maxFiles)
  }

  /** Rewrite every candidate partition into
    * `max(1, ceil(bytes / targetFileBytes))` files, preserving the store's
    * sort contract. Returns (partitions rewritten, files before, files
    * after). Idempotent: a second run finds no candidates and is a no-op;
    * a retry after a crash overwrites to the same bytes (deterministic
    * input, deterministic sort, dynamic partition overwrite).
    */
  def compact(
      spark: SparkSession,
      tablePath: String,
      partitionCol: String = "pulse_number",
      sortCols: Seq[String] = Seq("jet_id", "order"),
      targetFileBytes: Long = 128L * 1024 * 1024
  ): (Int, Int, Int) = {
    // a partition is a candidate only when it holds MORE files than its
    // own target fan-in max(1, ceil(bytes/targetFileBytes)) — comparing
    // against a flat maxFiles=1 would re-select every partition that
    // LEGITIMATELY needs n>1 files and rewrite the same bytes on every
    // maintenance run (at 100 TB most pulse partitions exceed one target
    // file, so "the second run is a no-op" would be false exactly where
    // compaction matters)
    def targetFiles(bytes: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val cands = candidates(spark, tablePath)
      .filter(c => c.files > targetFiles(c.bytes))
    if (cands.isEmpty) return (0, 0, 0)
    // One job per distinct target file count (partitions needing the same
    // fan-in batch together); each overwrites only its own partition
    // values (dynamic mode), so untouched partitions keep their files.
    val byN = cands.groupBy(c => targetFiles(c.bytes))
    byN.foreach { case (n, group) =>
      val vals = group.map(_.partition.split("=", 2)(1))
      val base = spark.read.parquet(tablePath)
        .filter(col(partitionCol).cast("string").isin(vals: _*))
      // One task per partition value; for n > 1 the task splits its
      // sorted stream every ceil(rows/n) records (maxRecordsPerFile) —
      // deterministic file boundaries, contiguous sort ranges per file
      // (row-group min/max stats stay tight), retry-identical bytes.
      val writer = base
        .repartition(group.size, col(partitionCol))
        .sortWithinPartitions(col(partitionCol) +: sortCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        // per-writer dynamic mode (never spark.conf.set — a session-global
        // flip would change every later partitioned overwrite's semantics)
        .option("partitionOverwriteMode", "dynamic")
      val sized =
        if (n == 1) writer
        else {
          val maxRows = base.groupBy(col(partitionCol)).count()
            .agg(max("count")).head().getLong(0)
          writer.option("maxRecordsPerFile", math.max(1L, (maxRows + n - 1) / n))
        }
      sized.partitionBy(partitionCol).parquet(tablePath)
    }
    graft.sources.RelationCache.invalidate(tablePath)
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val after = cands.map { c =>
      fs.listStatus(new Path(root, c.partition))
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    }.sum
    (cands.size, cands.map(_.files).sum, after)
  }
}
