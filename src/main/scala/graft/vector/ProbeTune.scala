package graft.vector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off exploration: ANN-LSH recall vs (bits, maxProbes) on testdata. */
object ProbeTune {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.withDriftDefaults(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding")).as[Seq[Float]].head()
    val exact = Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0L), q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    println("true top10 cosines: " + exact.map(_._2).map(c => f"$c%.3f").mkString(", "))
    val exactIds = exact.map(_._1).toSet
    for (bits <- Seq(6, 8, 10); frac <- Seq(0.125, 0.25, 0.375, 0.5)) {
      val maxProbes = math.max(1, ((1 << bits) * frac).toInt)
      val probes = Similarity.marginProbeBuckets(q, bits, 42L, maxProbes)
      val got = emb.filter(col("vec_id") =!= 0L)
        .withColumn("sig", Similarity.lshSignature(col("embedding"), q.length, bits))
        .filter(col("sig").isin(probes: _*))
        .select(col("vec_id"), Similarity.cosineLit(col("embedding"), q).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
      val frackept = emb.withColumn("sig", Similarity.lshSignature(col("embedding"), q.length, bits))
        .filter(col("sig").isin(probes: _*)).count().toDouble / emb.count()
      println(f"bits=$bits maxProbes=$maxProbes (${frac * 100}%.0f%% buckets, ${frackept * 100}%.0f%% rows) recall=${got.intersect(exactIds).size / 10.0}%.1f")
    }
    for (nCells <- Seq(16, 32); refine <- Seq(0, 2); nProbe <- Seq(2, 4, 6, 8)) {
      val cents0 = Ivf.centroids(emb, nCells)
      val cents = if (refine == 0) cents0 else Ivf.refineCentroids(emb, cents0, refine)
      val probed = Ivf.cellsByAffinity(q, cents).take(nProbe)
      val assigned = emb.filter(col("vec_id") =!= 0L)
        .withColumn("cell", Ivf.cellOf(col("embedding"), cents))
      val got = assigned.filter(col("cell").isin(probed: _*))
        .select(col("vec_id"), Similarity.cosineLit(col("embedding"), q).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSet
      val kept = assigned.filter(col("cell").isin(probed: _*)).count().toDouble /
        assigned.count()
      println(f"ivf nCells=$nCells refine=$refine nProbe=$nProbe (${kept * 100}%.0f%% rows) recall=${got.intersect(exactIds).size / 10.0}%.1f")
    }
    spark.stop()
  }
}
