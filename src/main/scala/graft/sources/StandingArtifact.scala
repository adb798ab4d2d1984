package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once parquet artifacts derived from a source dataset — the
  * standing tables a pipeline service keeps warm (hash indexes, near-dup
  * pair graphs, cluster maps, ANN cells). The build runs at most once per
  * path (guarded by parquet's `_SUCCESS` marker); every later call is a
  * pure read. Callers embed build PARAMETERS and a source-data fingerprint
  * in the path (see [[graft.vector.AnnIndex.indexRoot]]) so changed inputs
  * or parameters rebuild under a new path instead of silently serving
  * stale rows.
  */
object StandingArtifact {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build-if-absent, then hand back the relation-cached read. `build` is
    * by-name: an existing artifact never pays the build plan at all.
    */
  def ensure(spark: SparkSession, path: String)(build: => DataFrame): DataFrame = {
    if (!exists(spark, path)) {
      build.write.mode("overwrite").parquet(path)
      RelationCache.invalidate(path)
    }
    RelationCache.parquet(spark, path)
  }
}
