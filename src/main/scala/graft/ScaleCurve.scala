package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Three-point scale curve over the REAL testdata distribution: times the
  * heaviest catalog queries at sf0.01, sf0.1, and a synthesized sf1
  * (10× sf0.1), and flags any query whose cost grows superlinearly in
  * rows. [[ScaleProbe]] answers the same question on synthetic corpora
  * with tunable knobs; this tool answers it on the corpus the
  * correctness gate actually runs, so the two sf-testdata points anchor
  * the curve to published bench numbers.
  *
  * The sf1 point is RESAMPLED from sf0.1 — ten key-shifted copies per
  * table — because the corpus generator lives driver-side. Resampling
  * rules keep the workload's JOIN and CANDIDATE structure honest at 10×
  * instead of planting artificial blowups:
  *
  *  - `documents`: doc_id shifted per copy; copies > 0 get a copy-marker
  *    token appended, so exact/near-dup CLASSES keep their sf0.1 sizes
  *    (verbatim copies would turn every class into a 10-member clique
  *    and inflate candidate pairs quadratically — a different workload,
  *    not a bigger one);
  *  - `embeddings`: vec_id shifted; copies > 0 multiplied by a per-copy
  *    deterministic ±1 sign pattern — norms and per-dimension
  *    distributions unchanged, cross-copy cosine ≈ 0 (verbatim copies
  *    would be 10-way exact near-dups at cosine 1.0);
  *  - TPC-H tables: foreign keys shifted consistently per copy
  *    (customer/supplier/orders/lineitem), fixed-size dimensions
  *    (region, nation, part) kept as-is — join selectivities preserved,
  *    like TPC-H's own scale factors.
  *
  * Run: `runMain graft.ScaleCurve` (writes the markdown table to stdout
  * between SCALE-BEGIN/SCALE-END markers; SCALE.md is assembled from it).
  */
object ScaleCurve {

  /** The heavy set: the 10 most expensive catalog queries in the r13
    * clean bench run — everything above ~0.5 s cold at sf0.1.
    */
  val HeavyQueries: Seq[String] = Seq(
    "dd_semdedup_fixed", "dd_ngram_jaccard", "dd_minhash", "dd_embed_lsh",
    "dd_embed", "dd_semdedup", "q5_region", "mm_features", "emb_kmeans",
    "ann_lsh")

  // ---- sf1 synthesis -----------------------------------------------------

  private def keyShift(df: DataFrame, copy: Int, shifts: Map[String, Long]) =
    shifts.foldLeft(df) { case (d, (c, span)) =>
      d.withColumn(c, col(c) + lit(copy * span))
    }

  /** Span for a key column: next power of ten above the max, so shifted
    * copies never collide and keys stay readable.
    */
  private def span(df: DataFrame, key: String): Long = {
    val mx = df.agg(max(col(key))).head().getLong(0)
    var s = 10L
    while (s <= mx) s *= 10
    s
  }

  def ensureSf1(spark: SparkSession, src: String, dst: String, copies: Int = 10): String = {
    val done = new org.apache.hadoop.fs.Path(s"$dst/_SCALE_SUCCESS")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(done)) return dst
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def replicate(t: String, shifts: DataFrame => Map[String, Long],
        perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = read(t)
      val sh = shifts(base)
      val all = (0 until copies).map(i => perCopy(keyShift(base, i, sh), i))
        .reduce(_ unionByName _)
      write(all, t)
    }

    // fixed-size dimensions: straight copies
    Seq("region", "nation", "part").foreach(t => write(read(t), t))
    // events are not in the heavy set; copy as-is so the dir is a
    // complete testdata layout (catalog queries that read it still run)
    write(read("events"), "events")

    replicate("customer", b => Map("c_custkey" -> span(b, "c_custkey")))
    replicate("supplier", b => Map("s_suppkey" -> span(b, "s_suppkey")))
    locally {
      val orders = read("orders")
      val oSpan = span(orders, "o_orderkey")
      val cSpan = span(read("customer"), "c_custkey")
      write((0 until copies).map(i =>
        keyShift(orders, i, Map("o_orderkey" -> oSpan, "o_custkey" -> cSpan)))
        .reduce(_ unionByName _), "orders")
      val lineitem = read("lineitem")
      val sSpan = span(read("supplier"), "s_suppkey")
      val pSpan = span(read("part"), "p_partkey")
      write((0 until copies).map(i =>
        keyShift(lineitem, i, Map("l_orderkey" -> oSpan, "l_suppkey" -> sSpan,
          "l_partkey" -> pSpan)))
        .reduce(_ unionByName _), "lineitem")
    }
    replicate("documents",
      b => Map("doc_id" -> span(b, "doc_id")),
      (d, i) =>
        if (i == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" copymark$i")))
          .withColumn("n_chars", length(col("text")).cast("long")))
    locally {
      val emb = read("embeddings")
      val vSpan = span(emb, "vec_id")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val all = (0 until copies).map { i =>
        val shifted = keyShift(emb, i, Map("vec_id" -> vSpan))
        if (i == 0) shifted
        else {
          // deterministic ±1 signs per (copy, dimension): FNV-ish mix
          val signs = array((0 until dim).map { j =>
            val h = (i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0x100000001B3L)
            lit(if (((h ^ (h >>> 31)) & 1L) == 0L) 1.0f else -1.0f)
          }: _*)
          shifted.withColumn("embedding",
            zip_with(col("embedding"), signs, (x, s) => (x * s).cast("float")))
        }
      }.reduce(_ unionByName _)
      write(all, "embeddings")
    }
    fs.create(done).close()
    dst
  }

  // ---- the curve -----------------------------------------------------------

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.serviceBuilder(cpus, "graft-scale-curve").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tdRoot = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val sf1 = ensureSf1(spark, s"$tdRoot/sf0.1",
      sys.env.getOrElse("GRAFT_SF1_DIR", "/tmp/graft-sf1"))
    val points = Seq("sf0.01" -> s"$tdRoot/sf0.01", "sf0.1" -> s"$tdRoot/sf0.1",
      "sf1" -> sf1)

    // JIT/codegen warmup OUTSIDE the timed points (the bench discipline)
    HeavyQueries.foreach { q =>
      try { SparkEntry.queries(q)(spark, s"$tdRoot/sf0.001").count(); () }
      catch { case e: Throwable => System.err.println(s"[scale] warm $q: ${e.getMessage}") }
    }
    // standing artifacts are write-path cost at every point — build them
    // before timing so the curve measures the QUERY path (ann_lsh,
    // semdedup artifacts)
    points.foreach { case (_, dir) =>
      try {
        graft.vector.AnnIndex.ensureAll(spark, dir)
        Queries.ensureSemdedupArtifacts(spark, dir)
        ()
      } catch { case e: Throwable => System.err.println(s"[scale] ensure $dir: ${e.getMessage}") }
    }

    // the round-14 curve flagged the then-fixed (bits=4, tables=16)
    // catalog row superlinear (26× for the 10× sf1 step — bucket
    // saturation); the catalog row now routes through the corpus-sized
    // geometry itself, so the curve keeps the OLD fixed configuration as
    // the comparison twin to show what the auto wiring bought
    val extraOps: Seq[(String, String => Long)] = Seq(
      "dd_embed_lsh_FIXED_4_16" -> { dir =>
        graft.vector.CosineDedup.lshPairsSized(
          graft.model.Domain.embeddings(spark, dir), dim = 64,
          threshold = Queries.EmbLshThreshold, bits = 4, tables = 16).count()
      })
    val allOps: Seq[(String, String => Long)] =
      HeavyQueries.map(q => q -> ((dir: String) =>
        SparkEntry.queries(q)(spark, dir).count())) ++ extraOps
    val rows = allOps.map { case (q, run) =>
      val times = points.map { case (label, dir) =>
        val t0 = System.nanoTime()
        val n = try run(dir)
          catch { case e: Throwable =>
            System.err.println(s"[scale] $q @ $label: ${e.getMessage}"); -1L }
        label -> ((System.nanoTime() - t0) / 1e9, n)
      }.toMap
      (q, times)
    }

    println("SCALE-BEGIN")
    println("| query | sf0.01 (s) | sf0.1 (s) | sf1 (s) | r(0.01→0.1) | r(0.1→1) | verdict |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { case (q, t) =>
      val (a, _) = t("sf0.01"); val (b, _) = t("sf0.1"); val (c, _) = t("sf1")
      val r1 = if (a > 0) b / a else -1
      val r2 = if (b > 0) c / b else -1
      // rows grow 10x per step; near-linear lands at ≤ ~13x (n log n +
      // fixed overhead), and a sub-second sf0.1 query is overhead-bound
      // at the small end so only the LAST step judges it
      val verdict =
        if (c < 0 || b < 0) "ERROR"
        else if (r2 <= 13.0) "linear"
        else if (r2 <= 20.0) "near-linear (flagged: watch)"
        else "SUPERLINEAR"
      println(f"| $q | $a%.2f | $b%.2f | $c%.2f | ${r1}%.1fx | ${r2}%.1fx | $verdict |")
    }
    println("SCALE-END")
    spark.stop()
  }
}
