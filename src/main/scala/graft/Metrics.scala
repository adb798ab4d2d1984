package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution metrics — the engine's observability layer (the
  * reference ships prometheus counters per operation in
  * `instrumentation/metrics`; the Spark-native analog is a
  * SparkListener, the same hook the Spark UI itself is built on).
  *
  * Attribution rides Spark's job-group local property: [[QueryMetrics
  * .measure]] tags the calling thread with `graft-metrics:<name>`, every
  * job launched by the body inherits the tag, `onJobStart` maps the
  * job's stages to the name, and `onTaskEnd` credits each finished
  * task's metrics. Local properties are thread-local, so concurrent
  * queries (a serving pool) attribute correctly.
  *
  * Listener events are delivered asynchronously on the bus thread, so
  * totals read immediately after an action may still be in flight —
  * [[QueryMetrics.settled]] polls until the task count stops moving.
  */
final class QueryMetricsListener extends SparkListener {
  import QueryMetrics._

  private val stageToName = new ConcurrentHashMap[Int, String]()
  private val jobStages = new ConcurrentHashMap[Int, Seq[Int]]()
  private val totals = new ConcurrentHashMap[String, Array[LongAdder]]()
  // per-(name, stageId) totals — the stage split is what locates a
  // scale regression inside a query (scan vs shuffle-write vs reduce):
  // per-query totals alone said "ev_sessions is CPU-bound at 500M"
  // without saying WHERE. Bounded: stages of measured queries only.
  private val stageTotals = new ConcurrentHashMap[(String, Int), Array[LongAdder]]()

  private def slots(name: String): Array[LongAdder] =
    totals.computeIfAbsent(name, _ => Array.fill(10)(new LongAdder))

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val group = Option(js.properties).map(_.getProperty("spark.jobGroup.id")).orNull
    if (group != null && group.startsWith(Prefix)) {
      val name = group.substring(Prefix.length)
      js.stageIds.foreach(sid => stageToName.put(sid, name))
      jobStages.put(js.jobId, js.stageIds)
    }
  }

  // evict stage attribution at JOB end, not stage completion: a stage
  // resubmitted after a fetch failure reuses its stage id (with a new
  // attempt), and speculative/zombie task-ends can land after the stage
  // completes — both must still credit their scope. Job end is the last
  // event of the job on the bus, so the map stays bounded per session
  override def onJobEnd(je: SparkListenerJobEnd): Unit = {
    Option(jobStages.remove(je.jobId)).foreach(_.foreach(stageToName.remove))
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val name = stageToName.get(te.stageId)
    val m = te.taskMetrics
    if (name != null && m != null) {
      credit(slots(name), m)
      credit(stageTotals.computeIfAbsent((name, te.stageId),
        _ => Array.fill(10)(new LongAdder)), m)
    }
  }

  private def credit(s: Array[LongAdder],
      m: org.apache.spark.executor.TaskMetrics): Unit = {
      s(0).add(m.executorRunTime)
      s(1).add(1L)
      // caveat: on local-fs parquet, bytesRead captures footer I/O only
      // (measured 17 KB credited for an 11 MB scan — the vectorized
      // reader's column reads bypass the Hadoop FS thread statistics
      // this counter rides). recordsRead is credited by the scan itself
      // and is the reliable scan-size signal; consumers (QTime's stage
      // split) report rows for input, bytes for shuffle.
      s(2).add(m.inputMetrics.bytesRead)
      s(3).add(m.inputMetrics.recordsRead)
      s(4).add(m.shuffleReadMetrics.totalBytesRead)
      s(5).add(m.shuffleWriteMetrics.bytesWritten)
      s(6).add(m.memoryBytesSpilled + m.diskBytesSpilled)
      s(7).add(m.resultSize)
      // GC and on-CPU time split "task time" into its honest parts:
      // runTime ≈ cpu + gc + blocked(IO/lock) — the three have entirely
      // different remedies, and a run can read as "97% utilization"
      // while most of that is pause or blocked time (the r17 ev_sessions
      // 500M diagnosis needed exactly this split)
      s(8).add(m.jvmGCTime)
      s(9).add(m.executorCpuTime / 1000000L) // ns → ms
  }

  private def toSnapshot(s: Array[LongAdder]): Snapshot =
    Snapshot(taskTimeMs = s(0).sum, tasks = s(1).sum, inputBytes = s(2).sum,
      inputRecords = s(3).sum, shuffleReadBytes = s(4).sum,
      shuffleWriteBytes = s(5).sum, spilledBytes = s(6).sum, resultBytes = s(7).sum,
      gcTimeMs = s(8).sum, cpuTimeMs = s(9).sum)

  /** Totals credited to `name` so far (absent = no finished tasks). */
  def snapshot(name: String): Option[Snapshot] =
    Option(totals.get(name)).map(toSnapshot)

  /** Per-stage totals credited to `name`, stageId-ascending (execution
    * order for a straight-line query) — the scan/shuffle/reduce split.
    */
  def stageSnapshots(name: String): Seq[(Int, Snapshot)] = {
    val it = stageTotals.entrySet().iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Snapshot)]
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == name) out += ((e.getKey._2, toSnapshot(e.getValue)))
    }
    out.sortBy(_._1).toSeq
  }

  def names: Seq[String] = {
    val it = totals.keys()
    Iterator.continually(if (it.hasMoreElements) Some(it.nextElement()) else None)
      .takeWhile(_.isDefined).flatten.toSeq.sorted
  }
}

object QueryMetrics {

  private[graft] val Prefix = "graft-metrics:"

  final case class Snapshot(
      taskTimeMs: Long,
      tasks: Long,
      inputBytes: Long,
      inputRecords: Long,
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      spilledBytes: Long,
      resultBytes: Long,
      gcTimeMs: Long = 0L,
      cpuTimeMs: Long = 0L)

  /** Register a fresh listener on the session's bus. */
  def install(spark: SparkSession): QueryMetricsListener = {
    val l = new QueryMetricsListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  /** Run `body` with every job it launches credited to `name`. The
    * caller's own job group (a serving pool's per-request group, set for
    * cancel-on-disconnect) is restored on exit — clearing it would strand
    * the request's later jobs outside their cancellation scope.
    */
  def measure[T](spark: SparkSession, name: String)(body: => T): T = {
    val sc = spark.sparkContext
    val saved = Seq("spark.jobGroup.id", "spark.job.description",
      "spark.job.interruptOnCancel").map(k => k -> sc.getLocalProperty(k))
    sc.setJobGroup(Prefix + name, s"metrics scope $name", interruptOnCancel = false)
    try body finally saved.foreach { case (k, v) => sc.setLocalProperty(k, v) }
  }

  /** [[QueryMetricsListener.snapshot]] after the listener bus settles:
    * polls until the credited task count holds still for two consecutive
    * intervals (or the timeout lapses) — events arrive on the bus thread
    * after the action returns, and a single unchanged poll can be a
    * mid-delivery stall (GC pause, event backlog), not a drained bus.
    */
  def settled(l: QueryMetricsListener, name: String,
      timeoutMs: Long = 2000, intervalMs: Long = 25): Option[Snapshot] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var prev = l.snapshot(name).map(_.tasks).getOrElse(-1L)
    var out = l.snapshot(name)
    var stableFor = 0
    while (stableFor < 2 && System.nanoTime() < deadline) {
      Thread.sleep(intervalMs)
      out = l.snapshot(name)
      val n = out.map(_.tasks).getOrElse(-1L)
      stableFor = if (n == prev && n >= 0) stableFor + 1 else 0
      prev = n
    }
    out
  }

  /** [[settled]] over EVERY scope at once: polls the total task count
    * across all names until it holds still. Use after a multi-query pass —
    * settling only the last scope can snapshot earlier scopes mid-delivery
    * when the bus backlog spans queries.
    */
  def settledAll(l: QueryMetricsListener,
      timeoutMs: Long = 2000, intervalMs: Long = 25): Unit = {
    def total: Long = l.names.flatMap(n => l.snapshot(n)).map(_.tasks).sum
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var prev = total
    var stableFor = 0
    while (stableFor < 2 && System.nanoTime() < deadline) {
      Thread.sleep(intervalMs)
      val n = total
      stableFor = if (n == prev) stableFor + 1 else 0
      prev = n
    }
  }

  /** Detach the listener from the session's bus (a long-lived service
    * measuring scoped requests should uninstall when done — the listener
    * accumulates one totals slot per scope name for its lifetime).
    */
  def uninstall(spark: SparkSession, l: QueryMetricsListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}
