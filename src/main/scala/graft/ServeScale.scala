package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-layer scale curve: measures the pulse-dimension costs the
  * SCALE.md query curve does not cover — the driver-held chain index
  * build, its version-keyed reuse, and the pulses page-serve path — at
  * growing PULSE-HISTORY sizes over a manifested store.
  *
  * Why a separate probe: the pulses dimension grows with wall-clock
  * time, not data volume (one row per 10 s pulse ≈ 3 M rows/year), and
  * every claim about it ("chain index is O(pulses) driver memory,
  * rebuilt only on a version bump; a page serve is bounded by the
  * dimension, never the fact table") is structural. This tool turns
  * those claims into numbers: three dimension sizes a decade apart in
  * cadence-time (5k ≈ 14 h, 50k ≈ 6 d, 500k ≈ 2 months of pulses),
  * records volume held constant so any growth is attributable to the
  * dimension alone (the page plan never touches records — plan-pinned
  * in CarriedPlanCheck/StoreServeSpec).
  *
  * Run: `sbt "runMain graft.ServeScale"` — prints a markdown table
  * between SERVE-SCALE markers (SCALE.md's serving section).
  */
object ServeScale {

  private def buildStore(spark: SparkSession, n: Int): String = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory(s"graft-serve-scale-$n").toString
    val start = graft.ingest.Canonicalize.MinTimePulse + 10L
    // a small committed records table makes the dir a store (detection +
    // manifest machinery); held CONSTANT across sizes
    graft.ingest.PulseWriter.commitPulse(
      gen.Fixtures.multiPulseBatches(spark, 3, 40, startPulse = start),
      base, collectDrops = false)
    // the pulses dimension at n rows, flushed exactly like the daemon:
    // bucket-partitioned manifested append, so reads resolve through the
    // manifest path. The span is the WRITE-SIDE DEFAULT — r15 measured
    // the remedy behind an env knob (10× coarser buckets at 5M pulses:
    // fast-warm 283→209 ms, the fast path pays partition-count plan
    // width); r16 wires [[Ingest.spanForExtent]] as the default for bulk
    // builds and the daemon's seed-time re-bucketing, so this probe now
    // measures what a store actually gets with NO knob set.
    // GRAFT_SERVE_SPAN still overrides for A/Bs.
    // extent = the LAST pulse actually written (start + 10·(n−1)), not
    // one past it — at boundary sizes the off-by-one would pick a 10×
    // coarser span than the write path chooses for the identical store
    val span = sys.env.get("GRAFT_SERVE_SPAN").map(_.toLong)
      .getOrElse(Ingest.spanForExtent(start, start + 10L * (n - 1),
        Ingest.Config().flushBucketSpan, Ingest.Config().maxPulseBuckets))
    val dim = spark.range(n.toLong).select(
      (lit(start) + col("id") * 10L).as("pulse_number"),
      (lit(start) + (col("id") - 1L) * 10L).as("prev_pulse_number"),
      (lit(start) + (col("id") + 1L) * 10L).as("next_pulse_number"),
      lit(true).as("is_complete"),
      lit(true).as("is_sequential"),
      lit(2L).as("jet_drop_amount"),
      lit(40L).as("record_amount"),
      lit(20L).as("result_amount"),
      (lit(start) + col("id") * 10L - graft.ingest.Canonicalize.MinTimePulse).as("timestamp"),
      ((lit(start) + col("id") * 10L) / span).cast("long").as("pulse_bucket"))
    val buckets = dim.select(col("pulse_bucket")).distinct()
      .collect().map(r => s"pulse_bucket=${r.getLong(0)}").toSeq.sorted
    graft.ingest.TableManifest.appendCommit(spark, s"$base/pulses", buckets) {
      dim.repartition(buckets.size, col("pulse_bucket"))
        .sortWithinPartitions("pulse_number")
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("pulse_bucket").parquet(s"$base/pulses")
    }
    base
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.serviceBuilder(cpus, "graft-serve-scale").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    // 5M ≈ 19 months of 10 s cadence — one decade past the r14 ceiling,
    // deep into "mature deployment" pulse history. GRAFT_SERVE_SIZES
    // (comma-separated) narrows a run (e.g. a span-knob A/B at 5M only).
    val sizes = sys.env.get("GRAFT_SERVE_SIZES")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(5000, 50000, 500000, 5000000))
    // JIT/codegen warmup outside the timed points: full pass over a
    // throwaway SMALL store — always 5k, never sizes.head (a
    // GRAFT_SERVE_SIZES=5000000 A/B run must not build the 5M store
    // twice just to warm the JIT; the code paths are size-independent)
    locally {
      val w = buildStore(spark, 5000)
      graft.model.Domain.pulseChainIndex(spark, w)
      (1 to 3).foreach { _ =>
        api.Endpoints.pulses(spark, w, api.Endpoints.PageParams(limit = 20)).collect()
        api.Endpoints.pulses(spark, w, api.Endpoints.PageParams(limit = 20),
          fromTimestamp = Some(Long.MinValue)).collect()
      }
    }
    // settled used-heap reading for the index-memory column (driver-side
    // measurement tool — a GC call here is fine)
    def usedHeapMb(): Double = {
      System.gc()
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / 1e6
    }
    println("SERVE-SCALE-BEGIN")
    println("| pulses | ≈cadence-time | chain build (ms) | index heap (MB) | chain reuse (ms) | page fast cold (ms) | page fast warm (ms) | page scan warm (ms) |")
    println("|---|---|---|---|---|---|---|---|")
    for (n <- sizes) {
      val dir = buildStore(spark, n)
      val labels = Map(5000 -> "14 h", 50000 -> "6 d", 500000 -> "2 mo",
        5000000 -> "19 mo")
      var idx: graft.model.Domain.PulseChainIndex = null
      val heapBefore = usedHeapMb()
      val build = ms { idx = graft.model.Domain.pulseChainIndex(spark, dir) }
      val heapDelta = usedHeapMb() - heapBefore
      val reuse = ms {
        val again = graft.model.Domain.pulseChainIndex(spark, dir)
        require(again eq idx, "unchanged store must reuse the cached index")
      }
      // the endpoint both ways: the index fast path (default — total and
      // page slice from the driver-held chain index, one tight BETWEEN
      // fetch) vs the scan path (forced by a no-op timestamp bound —
      // full scan-sort-count of the dimension, what every page cost
      // before the fast path)
      def endpointFast() =
        api.Endpoints.pulses(spark, dir, api.Endpoints.PageParams(limit = 20)).collect()
      def endpointScan() =
        api.Endpoints.pulses(spark, dir, api.Endpoints.PageParams(limit = 20),
          fromTimestamp = Some(Long.MinValue)).collect()
      val fastCold = ms(endpointFast())
      val fastWarm = (1 to 3).map(_ => ms(endpointFast())).min
      val scanWarm = (1 to 3).map(_ => ms(endpointScan())).min
      println(f"| $n | ${labels.getOrElse(n, "—")} | $build%.0f | $heapDelta%.0f | $reuse%.1f | $fastCold%.0f | $fastWarm%.0f | $scanWarm%.0f |")
    }
    println("SERVE-SCALE-END")
    spark.stop()
  }
}
