package graft
import org.apache.spark.sql.SparkSession
object TsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.printSchema()
    e.selectExpr("event_id","ts","CAST(ts/1000 AS LONG) as us").show(3, false)
    spark.stop()
  }
}
