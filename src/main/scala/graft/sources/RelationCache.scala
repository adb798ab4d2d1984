package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session cache of parquet relations for tables and standing indexes.
  *
  * `spark.read.parquet(path)` builds a fresh `InMemoryFileIndex` — a
  * filesystem listing of every partition directory — on EVERY call. For a
  * one-shot batch job that cost is noise; for a serving layer answering
  * the same endpoint shapes repeatedly it dominates (measured: the
  * 256-bucket lifeline layout lists ~0.4s per query, capping the endpoint
  * at 2 q/s under concurrent load vs 20+ for its peers). A database keeps
  * its catalog open; this is the Spark analog — the resolved DataFrame
  * (and the file index inside its relation) is reused, while per-query
  * planning still applies partition pruning and predicate pushdown
  * against the cached index.
  *
  * Keyed by (session, path) so tests with fresh sessions never see a
  * stale plan; writers must [[invalidate]] after rewriting a path.
  */
object RelationCache {

  private val cache = new ConcurrentHashMap[String, DataFrame]()

  private def key(spark: SparkSession, path: String): String =
    System.identityHashCode(spark) + ":" + path

  def parquet(spark: SparkSession, path: String): DataFrame =
    cache.computeIfAbsent(key(spark, path), _ => spark.read.parquet(path))

  /** Drop every session's entry for `path` AND anything under it (call
    * after rewriting a path). Subtree matching matters: artifact roots
    * hold nested datasets (`<ivf>/vectors`, `<ivf>/centroids`) cached
    * under their own keys — deleting the root recursively while an exact
    * match survived would leave a stale file index pointing at removed
    * part-files.
    */
  def invalidate(path: String): Unit = {
    val prefix = if (path.endsWith("/")) path else path + "/"
    cache.keySet().removeIf { k =>
      val p = k.substring(k.indexOf(':') + 1)
      p == path || p.startsWith(prefix)
    }
  }

  def clear(): Unit = cache.clear()
}
