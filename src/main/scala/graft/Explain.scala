package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.withDriftDefaults(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_EXPLAIN_DIR points the dump at any corpus (probe corpora too)
    val dir = sys.env.getOrElse("GRAFT_EXPLAIN_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg", "be_records_page", "q3_topk")
    names.foreach { n =>
      println(s"\n=============== $n ===============")
      Queries.catalog(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
