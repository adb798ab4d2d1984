package graft

import org.apache.spark.sql.SparkSession

/** The session configs every graft entry point must share, in ONE place.
  *
  * Two configs are load-bearing for correctness, not tuning:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — the driver's
  *    `events.ts` has shipped as INT64 TIMESTAMP(NANOS); without the flag
  *    that physical form fails to read at all. It must be set BEFORE the
  *    first events relation resolves: a relation cached without it keeps
  *    the wrong schema for the session's lifetime.
  *  - `spark.sql.session.timeZone=UTC` — the TIMESTAMP(MICROS) drift form
  *    is normalized to epoch-nanos through a session-zone-dependent cast
  *    ([[graft.model.DriftAdapters]]); any other zone shifts every pulse
  *    bucket.
  *
  * Historically `Domain.events` set both defensively on every call, which
  * works only because all entry points happen to route through it before
  * the scan resolves. The accessors now ASSERT instead (fail loudly at
  * the first read) and construction happens here, where every main —
  * Bench, LoadProbe, Verify, Smoke, ScaleProbe, QTime, Explain — and the
  * test harness build their sessions.
  */
object Sessions {

  /** (key, required value) pairs — order matters only for error messages. */
  val DriftConfs: Seq[(String, String)] = Seq(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  /** Apply the drift-defense configs to a session builder. */
  def withDriftDefaults(b: SparkSession.Builder): SparkSession.Builder =
    DriftConfs.foldLeft(b) { case (acc, (k, v)) => acc.config(k, v) }

  /** The long-lived-service configs the bench measured as load-bearing
    * (`Bench.newSession` was where they first proved out):
    *
    *  - AQE + skew-join: runtime re-plan and skew splitting at the bench SF.
    *  - `codegen.cache.maxEntries=3000`: the catalog has ~67 queries x
    *    several codegen stages; the default 100-entry cache thrashes,
    *    recompiling every stage every pass (measured via CodegenMetrics).
    *    Any long-lived entry point — the API server above all — must hold
    *    its working set of generated classes.
    *  - FAIR scheduling: concurrent requests (or attack threads) share
    *    the pool instead of FIFO-starving point lookups behind one heavy
    *    page.
    *
    * Every serving entry point (Serve, Bench, LoadProbe) builds through
    * [[serviceBuilder]] so the production binary runs the exact
    * configuration the bench proved; ServiceConfsSpec pins the set.
    */
  val ServiceConfs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.codegen.cache.maxEntries" -> "3000",
    "spark.scheduler.mode" -> "FAIR",
    "spark.ui.enabled" -> "false")

  /** The COMPLETE conf set [[serviceBuilder]] applies — drift defenses,
    * service configs, and shuffle parallelism matched to the core count.
    * Exposed as data so SessionsSpec can pin it without reflecting into
    * the builder.
    */
  def serviceConfPairs(cpus: String): Seq[(String, String)] =
    DriftConfs ++ ServiceConfs :+ ("spark.sql.shuffle.partitions" -> cpus)

  /** Session builder for every serving entry point: drift defenses plus
    * the benched service configs, `local[cpus]` with shuffle parallelism
    * matched to the core count (a 1000-executor deployment would swap the
    * master URL and scale `shuffle.partitions` with the cluster; nothing
    * else here is local-mode-specific).
    */
  def serviceBuilder(cpus: String, appName: String): SparkSession.Builder =
    serviceConfPairs(cpus).foldLeft(
      SparkSession.builder().master(s"local[$cpus]").appName(appName)
    ) { case (acc, (k, v)) => acc.config(k, v) }

  /** Assert (never set) the drift-defense configs on a live session —
    * called by the [[graft.model.Domain]] accessors before the events
    * relation can resolve. Setting here instead would mask the ordering
    * hazard: a caller that had already resolved the scan through another
    * path would keep serving the wrong schema silently.
    */
  def assertDriftConfs(spark: SparkSession): Unit =
    DriftConfs.foreach { case (k, v) =>
      val got = spark.conf.getOption(k)
      if (!got.contains(v))
        throw new IllegalStateException(
          s"session conf $k=${got.getOrElse("<unset>")}, but the graft domain views require " +
          s"'$v' before the first events scan resolves (a relation cached under the wrong " +
          "config keeps the wrong schema for the session's lifetime). Build the session " +
          "with graft.Sessions.withDriftDefaults(SparkSession.builder()...).")
    }
}
