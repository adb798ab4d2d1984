package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: `runMain graft.QTime <sfDir> <query> [query...]`
  * — times each named catalog query (after a small-SF warmup) and prints
  * seconds, so single operators can be profiled without the full Bench.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_agg")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = Sessions.withDriftDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // match the serving posture (Sessions.serviceConfPairs): reducer
      // counts from data size, so isolated re-measures see the same
      // plans the bench and the servers run — through the SAME helper
      // (size-derived initial, r18), so a non-default SPARK_GRAFT_CPUS
      // or a different-sized dir still mirrors the servers
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Sessions.initialPartitionsSized(cpus,
          Sessions.dirBytes(sfDir, Sessions.posturesSaturatedAt(cpus))))
      .config("spark.ui.enabled", "false"))
    // ad-hoc knob experiments: SPARK_GRAFT_CONF="k=v;k=v" overlays the
    // defaults above, so A/B runs don't need a recompile
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => builder.config(k.trim, v.trim)
        case _ =>
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // pre-build standing indexes like Bench does, so index-backed queries
    // time the read path rather than a one-time build
    try {
      graft.vector.AnnIndex.ensureAll(spark, sfDir)
      graft.ingest.LifelineLayout.ensure(graft.model.Domain.records(spark, sfDir),
        graft.vector.AnnIndex.indexRoot(sfDir) + "/lifeline")
    } catch { case e: Throwable => println(s"index prebuild: ${e.getMessage}") }
    // task-level metrics ride every timed run (spill/shuffle/GC are what
    // separate "CPU-bound at scale" from "working set fell out of
    // execution memory" — the ev_sessions 500M diagnosis, r17)
    val qm = QueryMetrics.install(spark)
    // pre-fire each query's CONSTRUCTION at sfDir once (Set semantics:
    // once per name) before any timed window — construction-time jobs
    // (the once-per-dir ngram advisory, mm_features' memoized spot
    // check) otherwise land inside the FIRST timed execution only,
    // the exact one-sided charge Bench.ensureIndexes and ScaleProbe
    // pre-fire away; an instrument used for cross-tool comparisons
    // must exclude them the same way (review r17)
    names.distinct.foreach { n =>
      try { Queries.catalog(n)(spark, sfDir); () }
      catch { case e: Throwable => println(s"prefire $n: ${e.getMessage}") }
    }
    names.zipWithIndex.foreach { case (n, i) =>
      try { Queries.timingAction(n, Queries.catalog(n)(spark, "/root/testdata/sf0.001")); () }
      catch { case e: Throwable => println(s"warmup $n: ${e.getMessage}") }
      // SPARK_GRAFT_PHASES=1: split the DRIVER share of a timed run —
      // construction (expression building + any construction-time jobs)
      // and analyze→optimize→physical-plan, measured on a separate
      // instance so the timed run below is untouched. For sub-second
      // catalog rows this is the number that says whether the wall is
      // planning or AQE stage rounds (r17).
      if (sys.env.get("SPARK_GRAFT_PHASES").contains("1")) {
        try {
          val tC0 = System.nanoTime()
          val dfp = Queries.catalog(n)(spark, sfDir)
          val tC1 = System.nanoTime()
          dfp.queryExecution.executedPlan
          val tC2 = System.nanoTime()
          println(f"  phases $n%-18s construct=${(tC1 - tC0) / 1e9}%.3f " +
            f"plan=${(tC2 - tC1) / 1e9}%.3f")
        } catch { case e: Throwable => println(s"  phases $n: ${e.getMessage}") }
      }
      val tag = s"$n#$i"
      val t0 = System.nanoTime()
      val rows = QueryMetrics.measure(spark, tag) {
        Queries.timingAction(n, Queries.catalog(n)(spark, sfDir))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      QueryMetrics.settledAll(qm)
      val m = qm.snapshot(tag).map(s =>
        f"task_s=${s.taskTimeMs / 1e3}%.0f cpu_s=${s.cpuTimeMs / 1e3}%.0f " +
        f"gc_s=${s.gcTimeMs / 1e3}%.0f spill_gb=${s.spilledBytes / 1e9}%.1f " +
        f"shuf_w_gb=${s.shuffleWriteBytes / 1e9}%.2f tasks=${s.tasks}")
        .getOrElse("")
      println(f"$n%-22s $sec%8.3f s   rows=$rows   $m")
      // SPARK_GRAFT_STAGES=1: the per-stage split (scan vs shuffle-write
      // vs reduce) — where inside the query a scale regression lives.
      // Input is reported in ROWS, not bytes: on local-fs parquet the
      // task inputMetrics.bytesRead captures only footer I/O (measured
      // 17 KB credited for an 11 MB scan — the vectorized reader's
      // column-chunk reads bypass the Hadoop FS thread statistics the
      // byte counter rides), so a byte column would print 0.00 under a
      // multi-GB scan and misattribute the stage as input-free. Row
      // counts are credited directly by the scan and identify the scan
      // stage just as well.
      if (sys.env.get("SPARK_GRAFT_STAGES").contains("1"))
        qm.stageSnapshots(tag).foreach { case (sid, s) =>
          println(f"  stage $sid%-5d task_s=${s.taskTimeMs / 1e3}%7.0f cpu_s=${s.cpuTimeMs / 1e3}%7.0f " +
            f"gc_s=${s.gcTimeMs / 1e3}%5.0f in_mrows=${s.inputRecords / 1e6}%7.1f " +
            f"sh_r_gb=${s.shuffleReadBytes / 1e9}%6.2f sh_w_gb=${s.shuffleWriteBytes / 1e9}%6.2f " +
            f"spill_gb=${s.spilledBytes / 1e9}%5.1f tasks=${s.tasks}%d")
        }
    }
    spark.stop()
  }
}
