package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once parquet artifacts derived from a source dataset — the
  * standing tables a pipeline service keeps warm (hash indexes, near-dup
  * pair graphs, cluster maps, ANN cells). The build runs at most once per
  * path (guarded by parquet's `_SUCCESS` marker); every later call is a
  * pure read. Callers embed build PARAMETERS and a source-data fingerprint
  * in the path (see [[graft.vector.AnnIndex.indexRoot]]) so changed inputs
  * or parameters rebuild under a new path instead of silently serving
  * stale rows.
  *
  * Concurrency: builds are serialized behind a per-path JVM lock, and the
  * build writes to a side directory that is renamed into place — two
  * concurrent first callers (a serving pool's threads racing on a cold
  * path) otherwise both pass the exists check and `mode(overwrite)`
  * deletes the winner's committed files under a third reader's scan.
  * Readers only ever see the path absent or fully committed.
  */
object StandingArtifact {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path + "/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build-if-absent, then hand back the relation-cached read. `build` is
    * by-name: an existing artifact never pays the build plan at all.
    */
  def ensure(spark: SparkSession, path: String)(build: => DataFrame): DataFrame =
    ensureWith(spark, path)(tmp => build.write.mode("overwrite").parquet(tmp))

  /** [[ensure]] for builders that need custom control of the write (e.g.
    * freeing checkpoint blocks only after the files land): `writeTo` must
    * leave a committed parquet directory (`_SUCCESS`) at the given
    * temporary location, which is then renamed to `path` under the lock.
    */
  def ensureWith(spark: SparkSession, path: String)(writeTo: String => Unit): DataFrame = {
    // positive existence is cached ([[ArtifactCache]]): steady-state
    // serving pays a set lookup here, not a filesystem stat per request
    if (!ArtifactCache.committed(path)(exists(spark, path))) {
      ArtifactCache.lockFor(path).synchronized {
        if (!exists(spark, path)) {
          val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
          val tmp = new Path(path + ".inprogress")
          fs.delete(tmp, true)
          writeTo(tmp.toString)
          fs.delete(new Path(path), true) // stale partial write, never committed
          fs.mkdirs(new Path(path).getParent)
          if (!fs.rename(tmp, new Path(path)))
            throw new java.io.IOException(s"rename $tmp -> $path failed")
          RelationCache.invalidate(path)
        }
      }
      ArtifactCache.add(path)
    }
    RelationCache.parquet(spark, path)
  }
}
