package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession

/** Load analog of the reference's vegeta suite
  * (`load/run_configs/all_sequence.yaml`: 5 rps per endpoint, 10 s
  * attack, ≤10 attackers, zero-error stop condition). BASELINE.md derives
  * the Spark-engine goal "serve each §2 endpoint shape at ≥5 q/s on
  * sf0.1 with zero errors"; the single-stream bench can't answer that —
  * an explorer API server overlaps requests, and Spark's scheduler is
  * built for concurrent jobs from multiple submitter threads.
  *
  * Method — mirrors the reference's sequence-of-attacks: warm every
  * `be_*` endpoint shape once, then attack each shape in turn with
  * `attackers` threads for `seconds`, FAIR-scheduled. The reported gate
  * value is the MINIMUM per-shape q/s (every endpoint must clear the
  * bar, not the average). One JSON line: per-shape q/s, min/mean, errors.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.LoadProbe"
  */
object LoadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val attackers = sys.env.getOrElse("SPARK_GRAFT_ATTACKERS", "8").toInt
    val seconds = sys.env.getOrElse("SPARK_GRAFT_SECONDS", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // FAIR keeps one heavy shape from starving the others' jobs, the
      // way an API server's request pool would schedule.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shapes = SparkEntry.queries.toSeq.filter(_._1.startsWith("be_")).sortBy(_._1)
    // Standing indexes first (write-path cost, excluded from serving q/s).
    graft.vector.AnnIndex.ensureAll(spark, sfDir)
    graft.ingest.LifelineLayout.ensure(graft.model.Domain.records(spark, sfDir),
      graft.vector.AnnIndex.indexRoot(sfDir) + "/lifeline")
    // Warm pass: codegen + file-index caches out of the measured window.
    shapes.foreach { case (_, fn) => fn(spark, sfDir).count() }

    val errors = new AtomicLong()
    val perShape = shapes.map { case (name, fn) =>
      name -> LoadProbe.attack(spark, sfDir, fn, attackers, seconds * 1000L, errors)
    }
    val perShapeJson = perShape
      .map { case (n, q) => "\"" + n + "\":" + f"$q%.2f" }.mkString("{", ",", "}")
    val minQps = perShape.map(_._2).min
    val meanQps = perShape.map(_._2).sum / perShape.length
    println(f"""{"metric":"load_min_shape_qps","value":$minQps%.2f,"unit":"q/s","mean_qps":$meanQps%.2f,"attackers":$attackers,"seconds_per_shape":$seconds,"shapes":${shapes.length},"per_shape_qps":$perShapeJson,"errors":${errors.get()},"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Hammer one query shape with `attackers` threads for `millis`;
    * returns completed q/s (failures count into `errors`).
    */
  def attack(
      spark: SparkSession,
      sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      attackers: Int,
      millis: Long,
      errors: AtomicLong
  ): Double = {
    val done = new AtomicBoolean(false)
    val completed = new AtomicLong()
    val threads = (0 until attackers).map { _ =>
      new Thread(() => {
        while (!done.get()) {
          try { fn(spark, sfDir).count(); completed.incrementAndGet() }
          catch { case _: Throwable => errors.incrementAndGet() }
        }
      })
    }
    val t0 = System.nanoTime()
    threads.foreach(_.start())
    Thread.sleep(millis)
    done.set(true)
    threads.foreach(_.join())
    completed.get() / ((System.nanoTime() - t0) / 1e9)
  }
}
