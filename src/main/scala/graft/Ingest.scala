package graft

import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.JetFunctions
import graft.ingest.{Canonicalize, GrpcTransport, PulseWriter, Resilience, Spine, Transport}

/** The ingest daemon binary — the reference's FIRST binary, the
  * `cmd/block-explorer/main.go:35-180` analog: connect to a live record
  * exporter over gRPC, follow the feed head pulse-by-pulse, and maintain
  * the three storage tables (records, jet_drops, pulses) with the
  * controller's background cadences until killed.
  *
  *   SPARK_GRAFT_EXPORTER_HOST=localhost SPARK_GRAFT_EXPORTER_PORT=8090 \
  *   SPARK_GRAFT_BASE_PATH=/data/graft SPARK_GRAFT_FROM_PULSE=65546 \
  *   sbt "runMain graft.Ingest"
  *
  * Three loops, exactly the reference's controller split
  * (`etl/controller/controller.go` + `pulsemaintainer.go:18-143`), with
  * the reference's default cadences (`configuration/configuration.go:
  * 116-122`: PulsePeriod 10 s, SequentialPeriod 1 s, ReloadPeriod
  * 1200 s):
  *
  *  - '''follower''' (the extractor's continuous pull,
  *    `etl/extractor/platform_impl.go:151-222`): fetch the pulse at the
  *    cursor through [[Transport.fetchPulse]] (portioned stream, resume
  *    cursor, end-of-pulse marker), commit it through the distributed
  *    [[Spine]] + idempotent partition overwrite, then advance by the
  *    exporter's iterate-from hint. `NOT_FOUND` means the head is
  *    reached — sleep half a pulse and re-ask (the reference's
  *    `ContinuousPulseRetrievingHalfPulseSeconds`). A transport failure
  *    that outlives the in-fetch reopen budget leaves the cursor where
  *    it is and retries after a pause, so an exporter restart loses
  *    nothing: the managed channel reconnects and the portion protocol
  *    resumes at the record cursor.
  *  - '''maintainer''' (`pulseMaintainer`, every PulsePeriod): walk the
  *    in-memory jet-drop register (the reference's `jetDropRegister` —
  *    driver-held here too, populated at commit time for free from the
  *    pulse's own drop rows), mark pulses whose jet set forms a full
  *    binary-tree cover complete ([[JetFunctions.jetTreeCover]], ST2),
  *    re-request incomplete ones through the TTL-deduped reload
  *    ([[Resilience.MissedDataManager]], ST3 — `misseddata.go:60-95`),
  *    and persist the pulses dimension.
  *  - '''sequencer''' (`pulseSequence`, every SequentialPeriod): advance
  *    the sequential high-water mark over chain-linked complete pulses —
  *    zero wait between consecutive advances, like the reference's
  *    `waitTime = 0` fast path — and on a stall re-request the open gap
  *    up to the next saved pulse (`pulsemaintainer.go:86-143`).
  *
  * 100 TB shape: the per-pulse record set is bounded by the pulse
  * cadence (the reference holds it in one goroutine's memory the same
  * way), the spine is the only distributed stage, the commit is a
  * pruned single-partition overwrite, and the register/pulses dimension
  * is pulses-sized (tiny). Nothing here rescans the fact table.
  */
object Ingest {

  /** Controller cadences + transport knobs, reference defaults
    * (`configuration/configuration.go:62-122`).
    */
  final case class Config(
      pulsePeriodMs: Long = 10000L, // Controller.PulsePeriod (10 s)
      sequentialPeriodMs: Long = 1000L, // Controller.SequentialPeriod (1 s)
      reloadTtlMs: Long = 1200000L, // Controller.ReloadPeriod (1200 s)
      headPauseMs: Long = 5000L, // half a pulse at the feed head
      errorPauseMs: Long = 1000L, // pause after an exhausted fetch
      batchSize: Int = 100, // extractor portion size (main.go:79)
      fetchBackoffMs: Long = 200L, // in-fetch reopen backoff
      pulseDelta: Long = 10L)

  /** Driver-held register row: the reference's `jetDropRegister` entry
    * plus the pulse bookkeeping its storage rows carry.
    */
  final case class PulseEntry(
      prev: Long,
      jets: Set[String],
      recordAmount: Long,
      timestamp: Long,
      complete: Boolean,
      sequential: Boolean)

  /** The long-running daemon over any [[Transport.RecordStream]] — the
    * live gRPC wire in production ([[bootstrap]]), the replay harness in
    * specs and the bench. Callers own `start()`/`stop()`.
    */
  final class Daemon(
      spark: SparkSession,
      basePath: String,
      stream: Transport.RecordStream,
      fromPulse: Long,
      cfg: Config = Config()) {

    @volatile private var running = false
    @volatile private var cursorNow = fromPulse
    @volatile private var seqPulse = fromPulse - cfg.pulseDelta
    private val register = scala.collection.mutable.LinkedHashMap.empty[Long, PulseEntry]
    private val missed = new Resilience.MissedDataManager(cfg.reloadTtlMs)
    // commits serialize: concurrent dynamic-partition overwrites into one
    // table path would race in the commit protocol's staging directory
    // (the reference funnels all writes through one storage transaction)
    private val writeLock = new Object
    private var threads = Seq.empty[Thread]

    // ---- observability (the spec's and main's read surface) ------------

    def cursor: Long = cursorNow
    def sequentialPulse: Long = seqPulse
    def snapshot: Map[Long, PulseEntry] = register.synchronized(register.toMap)
    def ingestedCount: Int = register.synchronized(register.size)

    // ---- commit ---------------------------------------------------------

    /** Spine + idempotent partition overwrite for one pulse's wire rows,
      * then register the pulse's jets/counters from the drop rows (a
      * collect of one pulse's drops — jets-sized, the register the
      * reference populates in `processor.process`).
      */
    private def commit(pulse: Long, rows: Seq[Row]): Unit = {
      val dropRows = writeLock.synchronized {
        val wire = spark.createDataFrame(rows.asJava, graft.model.Schemas.wireRecords)
        val records = Spine(wire).cache()
        try {
          PulseWriter.writePulsePartition(records, "records", basePath)
          val drops = records.groupBy(col("pulse_number"), col("jet_id"))
            .agg(count(lit(1)).cast("int").as("record_amount"),
              min(col("timestamp")).as("timestamp"))
          PulseWriter.writePulsePartition(drops, "jet_drops", basePath)
          drops.collect()
        } finally { records.unpersist(); () }
      }
      register.synchronized {
        val jets = dropRows.map(_.getAs[String]("jet_id")).toSet
        val amount = dropRows.map(_.getAs[Int]("record_amount").toLong).sum
        val prior = register.get(pulse)
        // a reload MERGES jets (the exporter may serve jets it previously
        // omitted); prev is chain-derived at first sight and kept after
        val prev = prior.map(_.prev).getOrElse(
          register.keysIterator.filter(_ < pulse).maxOption.getOrElse(pulse - cfg.pulseDelta))
        register.update(pulse, PulseEntry(
          prev = prev,
          jets = prior.map(_.jets).getOrElse(Set.empty) ++ jets,
          recordAmount = amount,
          timestamp = pulse - Canonicalize.MinTimePulse,
          complete = prior.exists(_.complete),
          sequential = prior.exists(_.sequential)))
      }
    }

    /** Re-request one pulse (reload path). True when data arrived. */
    private def fetchAndCommit(pulse: Long): Boolean =
      Transport.fetchPulse(stream, pulse, cfg.batchSize,
        backoffMs = cfg.fetchBackoffMs) match {
        case Some(fp) => commit(pulse, fp.rows); true
        case None => false
      }

    // ---- follower -------------------------------------------------------

    /** Cooperative pause: sleeps in ≤100 ms slices so `stop()` can end a
      * loop WITHOUT interrupting it — an interrupt landing inside a Spark
      * write aborts the job asynchronously and its `_temporary` cleanup
      * races the shutdown flush's own write.
      */
    private def nap(ms: Long): Unit = {
      val t0 = System.nanoTime()
      while (running && (System.nanoTime() - t0) / 1e6 < ms)
        Thread.sleep(math.min(100L, ms))
    }

    private def followLoop(): Unit =
      while (running) {
        try {
          Transport.fetchPulse(stream, cursorNow, cfg.batchSize,
            backoffMs = cfg.fetchBackoffMs) match {
            case Some(fp) =>
              val p = cursorNow
              commit(p, fp.rows)
              cursorNow = if (fp.iterateFrom > p) fp.iterateFrom else p + cfg.pulseDelta
            case None =>
              // head reached (NOT_FOUND): half-pulse pause, same cursor
              nap(cfg.headPauseMs)
          }
        } catch {
          case _: InterruptedException => return
          case _: Throwable =>
            // exporter down past the reopen budget, or a commit failure:
            // hold the cursor and retry after a pause — the extractor
            // retries forever under its controller's cancellation
            try nap(cfg.errorPauseMs)
            catch { case _: InterruptedException => return }
        }
      }

    // ---- maintainer (pulseMaintainer analog) ----------------------------

    private def maintainOnce(): Unit = {
      val snap = snapshot
      snap.foreach { case (p, e) =>
        if (!e.complete) {
          if (JetFunctions.jetTreeCover(e.jets)) {
            register.synchronized {
              register.get(p).foreach(cur => register.update(p, cur.copy(complete = true)))
            }
          } else if (!missed.covered(p, p)) {
            // incomplete → TTL-deduped re-request; register the attempt
            // only once it ran without throwing (like Pipeline.run)
            try { fetchAndCommit(p); missed.addIfNew(p, p); () }
            catch { case _: InterruptedException => throw new InterruptedException
                    case _: Throwable => () }
          }
        }
      }
      flush()
    }

    private def maintainLoop(): Unit =
      while (running) {
        try { nap(cfg.pulsePeriodMs); if (running) maintainOnce() }
        catch { case _: InterruptedException => return
                case _: Throwable => () }
      }

    // ---- sequencer (pulseSequence analog) -------------------------------

    private def sequenceOnce(): Unit = {
      var advanced = true
      while (advanced) { // waitTime=0 fast path: chain through in one round
        advanced = false
        val snap = snapshot
        snap.find { case (_, e) => e.prev == seqPulse } match {
          case Some((p, e)) if e.complete =>
            register.synchronized {
              register.get(p).foreach(cur => register.update(p, cur.copy(sequential = true)))
            }
            seqPulse = p
            advanced = true
          case _ =>
            // stalled: re-request the open gap up to the next saved pulse
            // (GetNextSavedPulse + reloadData, pulsemaintainer.go:120-139)
            snap.keysIterator.filter(_ > seqPulse).minOption.foreach { nextSaved =>
              val (from, to) = (seqPulse + cfg.pulseDelta, nextSaved - cfg.pulseDelta)
              if (from <= to && !missed.covered(from, to)) {
                try {
                  (from to to by cfg.pulseDelta)
                    .filterNot(snap.contains).foreach(fetchAndCommit)
                  missed.addIfNew(from, to)
                  ()
                } catch { case _: InterruptedException => throw new InterruptedException
                          case _: Throwable => () }
              }
            }
        }
      }
    }

    private def sequenceLoop(): Unit =
      while (running) {
        try { nap(cfg.sequentialPeriodMs); if (running) sequenceOnce() }
        catch { case _: InterruptedException => return
                case _: Throwable => () }
      }

    // ---- pulses dimension -----------------------------------------------

    /** Persist the pulses dimension from the register — the reference's
      * pulses table with its maintained flags (`CompletePulse` /
      * `SequencePulse`, `etl/storage/storage.go`). Pulses-sized: a tiny
      * driver-built frame, one overwrite.
      */
    def flush(): Unit = {
      val snap = snapshot
      if (snap.isEmpty) return
      val nextByPrev = snap.map { case (p, e) => e.prev -> p }
      val rows: Seq[Row] = snap.toSeq.sortBy(_._1).map { case (p, e) =>
        Row(p, e.prev, nextByPrev.getOrElse(p, p + cfg.pulseDelta),
          e.complete, e.sequential, e.jets.size, e.recordAmount, e.timestamp)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pulse_number", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("prev_pulse_number", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("next_pulse_number", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("is_complete", org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("is_sequential", org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("jet_drop_amount", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("record_amount", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("timestamp", org.apache.spark.sql.types.LongType, nullable = false)))
      writeLock.synchronized {
        spark.createDataFrame(rows.asJava, schema)
          .coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$basePath/pulses")
      }
    }

    // ---- lifecycle ------------------------------------------------------

    def start(): this.type = synchronized {
      require(threads.isEmpty, "daemon already started")
      running = true
      threads = Seq(
        new Thread(() => followLoop(), "graft-ingest-follower"),
        new Thread(() => maintainLoop(), "graft-ingest-maintainer"),
        new Thread(() => sequenceLoop(), "graft-ingest-sequencer"))
      threads.foreach { t => t.setDaemon(true); t.start() }
      this
    }

    def stop(): Unit = synchronized {
      running = false
      // cooperative first: the sliced sleeps notice the flag within
      // ~100 ms and in-flight Spark writes complete cleanly; interrupt
      // only a loop stuck past that (a hung wire read)
      threads.foreach(_.join(15000))
      threads.filter(_.isAlive).foreach { t => t.interrupt(); t.join(5000) }
      threads = Seq.empty
      // final maintainer pass so the persisted flags reflect everything
      // committed before shutdown (the graceful-stop flush)
      try { maintainOnce(); sequenceOnce(); flush() } catch { case _: Throwable => () }
    }
  }

  /** Everything `main` does short of blocking: open the plaintext channel
    * (1 GiB inbound cap, like the reference transport), wrap the live
    * record stream, start the daemon. Callers own `stop()` on the
    * returned handle (which also closes the channel).
    */
  final class Handle private[Ingest] (val daemon: Daemon,
      channel: org.sparkproject.connect.grpc.ManagedChannel) {
    def stop(): Unit = { daemon.stop(); GrpcTransport.close(channel) }
  }

  def bootstrap(spark: SparkSession, basePath: String, host: String, port: Int,
      fromPulse: Long, cfg: Config = Config()): Handle = {
    val ch = GrpcTransport.channel(host, port)
    val daemon = new Daemon(spark, basePath,
      new GrpcTransport.GrpcRecordStream(ch), fromPulse, cfg).start()
    new Handle(daemon, ch)
  }

  def main(args: Array[String]): Unit = {
    val host = sys.env.getOrElse("SPARK_GRAFT_EXPORTER_HOST", "localhost")
    val port = sys.env.getOrElse("SPARK_GRAFT_EXPORTER_PORT", "8090").toInt
    val base = sys.env.getOrElse("SPARK_GRAFT_BASE_PATH", "/tmp/graft-ingest")
    val from = sys.env.getOrElse("SPARK_GRAFT_FROM_PULSE",
      (Canonicalize.MinTimePulse + 10L).toString).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.serviceBuilder(cpus, "graft-ingest").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val handle = bootstrap(spark, base, host, port, from)
    println(s"""{"metric":"ingesting","exporter":"$host:$port","base":"$base","from":$from}""")
    sys.addShutdownHook { handle.stop(); spark.stop() }
    Thread.currentThread.join() // ingest until killed
  }
}
