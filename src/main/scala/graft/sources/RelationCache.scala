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
  * Keyed by (session UUID, path) so tests with fresh sessions never see a
  * stale plan — the UUID, not the object's identity hash, because an
  * identity hash can be REUSED after a session is GC'd, which would hand
  * a new session a DataFrame bound to a stopped SparkContext. Writers
  * must [[invalidate]] after rewriting a path; entries of stopped
  * sessions are swept on the next miss so a long-lived multi-session
  * process (the test suite, a rolling redeploy) never pins dead
  * sessions' file indexes.
  */
object RelationCache {

  private final case class Entry(session: SparkSession, df: DataFrame)

  private val cache = new ConcurrentHashMap[String, Entry]()

  /** Hooks run on [[invalidate]]/[[clear]] with the affected path (null
    * for a full clear) — derived per-path memos (e.g. the drift layer's
    * epoch-scale cache) register here so "writer rewrote the path" is
    * ONE invalidation call for every cache keyed by it.
    */
  private val invalidationHooks =
    new java.util.concurrent.CopyOnWriteArrayList[String => Unit]()

  def onInvalidate(hook: String => Unit): Unit = { invalidationHooks.add(hook); () }

  // One UUID per live session OBJECT, never reused (unlike an identity
  // hash, which the JVM can hand to a new session after the old one is
  // GC'd — the collision that would serve a DataFrame bound to a stopped
  // context). Weak keys: the id map itself never pins a session.
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def key(spark: SparkSession, path: String): String =
    sessionIds.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString) +
      ":" + path

  // bumped by every invalidate/clear — the publish guard below. A global
  // counter (not per-path) errs toward a missed cache on unrelated
  // concurrent invalidations, never toward a stale index.
  private val epoch = new java.util.concurrent.atomic.AtomicLong(0L)

  def parquet(spark: SparkSession, path: String): DataFrame =
    cache.get(key(spark, path)) match {
      case e: Entry => e.df
      case null =>
        // miss: sweep entries whose session is gone before adding — the
        // sweep is O(entries) against a map that holds one entry per
        // (live session, table), dozens at most
        cache.entrySet().removeIf(_.getValue.session.sparkContext.isStopped)
        // TOCTOU guard: the file listing happens OUTSIDE the map, so a
        // writer's invalidate() can land between our listing and our
        // publish — its removeIf finds no key and the pre-rewrite index
        // would be cached "clean" and served until the next invalidation
        // (FileNotFound on compacted tables, silently missing batches on
        // appended ones). Publish only if no invalidation happened while
        // we resolved; otherwise serve the frame uncached.
        val e0 = epoch.get()
        val df = spark.read.parquet(path)
        if (epoch.get() == e0) {
          val k = key(spark, path)
          cache.putIfAbsent(k, Entry(spark, df))
          // the pre-put epoch check alone leaves a window: an invalidate
          // can run entirely between it and the put (its removeIf finds
          // no key yet) and the pre-rewrite index would be published
          // "clean". Re-check AFTER publishing and withdraw on any
          // movement — this may evict another reader's fresh post-
          // invalidate entry, which errs toward a missed cache, never
          // toward a stale index (invalidate() increments the epoch
          // BEFORE its sweep, so one of the two checks always observes
          // a racing invalidation).
          if (epoch.get() != e0) cache.remove(k)
        }
        df
    }

  // ---- version-keyed relations (manifested store tables) ----------------

  private val versionedCache = new ConcurrentHashMap[String, (Long, Entry)]()

  /** Resolved relation for a MANIFESTED table at snapshot `version`
    * ([[graft.ingest.TableManifest]]): one live entry per (session,
    * path), replaced on version bump. An unchanged store re-serves the
    * cached file index with ZERO directory listings; a commit's version
    * bump swaps it out on the next read. No epoch dance is needed here —
    * the caller resolves the CURRENT version before asking, so a racing
    * commit can at worst leave an older (version, df) pair in the map,
    * which the very next read sees as a mismatch and rebuilds; it can
    * never be SERVED stale. invalidate()/clear() still drop these
    * entries, for writers that bypass the manifest protocol (a test
    * rewriting a fixture in place).
    */
  def versionedParquet(spark: SparkSession, path: String, version: Long)(
      build: => DataFrame): DataFrame = {
    val k = key(spark, path)
    val cur = versionedCache.get(k)
    if (cur != null && cur._1 == version &&
        !cur._2.session.sparkContext.isStopped) cur._2.df
    else {
      versionedCache.entrySet().removeIf(_.getValue._2.session.sparkContext.isStopped)
      val df = build
      versionedCache.put(k, (version, Entry(spark, df)))
      df
    }
  }

  /** Drop every session's entry for `path` AND anything under it (call
    * after rewriting a path). Subtree matching matters: artifact roots
    * hold nested datasets (`<ivf>/vectors`, `<ivf>/centroids`) cached
    * under their own keys — deleting the root recursively while an exact
    * match survived would leave a stale file index pointing at removed
    * part-files.
    */
  def invalidate(path: String): Unit = {
    epoch.incrementAndGet() // before the sweep: see the publish guard
    val prefix = if (path.endsWith("/")) path else path + "/"
    def hit(k: String): Boolean = {
      val p = k.substring(k.indexOf(':') + 1)
      p == path || p.startsWith(prefix)
    }
    cache.keySet().removeIf(hit(_))
    versionedCache.keySet().removeIf(hit(_))
    invalidationHooks.forEach(_.apply(path))
  }

  def clear(): Unit = {
    epoch.incrementAndGet()
    cache.clear()
    versionedCache.clear()
    invalidationHooks.forEach(_.apply(null))
  }
}
