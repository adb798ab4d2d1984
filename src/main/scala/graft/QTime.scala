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
    names.foreach { n =>
      try { Queries.catalog(n)(spark, "/root/testdata/sf0.001").count() }
      catch { case e: Throwable => println(s"warmup $n: ${e.getMessage}") }
      val t0 = System.nanoTime()
      val rows = Queries.catalog(n)(spark, sfDir).count()
      println(f"$n%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s   rows=$rows")
    }
    spark.stop()
  }
}
