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
  * (sorted by (jet_id, order) for row-group pruning), same MANIFESTED
  * commit the writer uses ([[TableManifest]]), so readers racing a
  * compaction keep serving the committed snapshot and a crashed
  * compaction retries to an identical result.
  *
  * On a manifested table, candidates and row reads come from the CURRENT
  * snapshot (a raw directory listing would count the superseded
  * generation the manifest keeps as crash grace and re-select partitions
  * forever); sizes are driver-side file stats over exactly the
  * manifest's files. A legacy table keeps the original listing +
  * dynamic-overwrite path.
  */
object Compaction {

  final case class PartitionStat(partition: String, files: Int, bytes: Long)

  /** Partitions under `tablePath` with more than `maxFiles` CURRENT data
    * files — the compaction candidates. Manifest-aware: superseded
    * generations awaiting GC are not counted.
    */
  def candidates(
      spark: SparkSession,
      tablePath: String,
      maxFiles: Int = 1
  ): Seq[PartitionStat] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val stats = TableManifest.latest(fs, tablePath) match {
      case Some(snap) =>
        snap.partitions.toSeq.map { case (part, files) =>
          val bytes = files.map { f =>
            try fs.getFileStatus(new Path(root, s"$part/$f")).getLen
            catch { case _: java.io.FileNotFoundException => 0L }
          }.sum
          PartitionStat(part, files.length, bytes)
        }
      case None =>
        fs.listStatus(root).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
          .map { dir =>
            val data = fs.listStatus(dir.getPath)
              .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            PartitionStat(dir.getPath.getName, data.length, data.map(_.getLen).sum)
          }
    }
    stats.filter(_.files > maxFiles)
  }

  /** Rewrite every candidate partition into
    * `max(1, ceil(bytes / targetFileBytes))` files, preserving the store's
    * sort contract. Returns (partitions rewritten, files before, files
    * after — CURRENT files, per the manifest when one exists). Idempotent:
    * a second run finds no candidates and is a no-op; a retry after a
    * crash re-replaces the same partitions with identical rows
    * (deterministic input, deterministic sort, manifested replace).
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
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifested = TableManifest.latest(fs, tablePath).isDefined
    // One job per distinct target file count (partitions needing the same
    // fan-in batch together); each replaces only its own partition
    // values, so untouched partitions keep their files.
    val byN = cands.groupBy(c => targetFiles(c.bytes))
    byN.foreach { case (n, group) =>
      val vals = group.map(_.partition.split("=", 2)(1))
      val source = TableManifest.readTable(spark, tablePath).getOrElse(
        throw new IllegalStateException(s"compaction candidates on a table " +
          s"with no committed data: $tablePath"))
      val base = source.filter(col(partitionCol).cast("string").isin(vals: _*))
      // One task per partition value; for n > 1 the task splits its
      // sorted stream every ceil(rows/n) records (maxRecordsPerFile) —
      // deterministic file boundaries, contiguous sort ranges per file
      // (row-group min/max stats stay tight), retry-identical bytes.
      val shaped = base
        .repartition(group.size, col(partitionCol))
        .sortWithinPartitions(col(partitionCol) +: sortCols.map(col): _*)
      val maxRows =
        if (n == 1) None
        else Some(base.groupBy(col(partitionCol)).count()
          .agg(max("count")).head().getLong(0))
      if (manifested) {
        // the writer's protocol ([[TableManifest.appendCommit]]): append
        // uniquely-named files, then publish a manifest version
        // replacing the candidate partitions
        TableManifest.appendCommit(spark, tablePath, group.map(_.partition)) {
          val w0 = shaped.write.mode(SaveMode.Append)
          maxRows.foreach(m => w0.option("maxRecordsPerFile", math.max(1L, (m + n - 1) / n)))
          w0.partitionBy(partitionCol).parquet(tablePath)
        }
      } else {
        val writer = shaped.write.mode(SaveMode.Overwrite)
          // per-writer dynamic mode (never spark.conf.set — a
          // session-global flip would change every later partitioned
          // overwrite's semantics)
          .option("partitionOverwriteMode", "dynamic")
        maxRows.foreach(m => writer.option("maxRecordsPerFile", math.max(1L, (m + n - 1) / n)))
        writer.partitionBy(partitionCol).parquet(tablePath)
      }
    }
    graft.sources.RelationCache.invalidate(tablePath)
    val currentSnap = TableManifest.latest(fs, tablePath)
    val after = cands.map { c =>
      currentSnap match {
        case Some(snap) => snap.partitions.getOrElse(c.partition, Seq.empty).length
        case None =>
          fs.listStatus(new Path(root, c.partition))
            .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      }
    }.sum
    (cands.size, cands.map(_.files).sum, after)
  }
}
