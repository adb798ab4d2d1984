package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class EventWindowsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  final case class Ev(ts: Timestamp, event_type: String, value: Double, event_id: Long)

  test("watermarked tumbling windows emit closed windows once (append)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventWindows.typeCounts(input.toDF(), size = "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("win_counts").outputMode("append").start()
    try {
      input.addData(Ev(ts(1), "view", 1.0, 1), Ev(ts(2), "view", 2.0, 2),
        Ev(ts(11), "click", 5.0, 3))
      q.processAllAvailable()
      // nothing closed yet: watermark is only at 10:11 - 5min = 10:06
      assert(spark.table("win_counts").count() == 0)

      // jump event time far ahead → both earlier windows close
      input.addData(Ev(ts(40), "view", 1.0, 4))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
        .toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00.0", "view", 2L, 3.0),
        ("2024-01-01 10:10:00.0", "click", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence within the watermark horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventWindows.dedupStream(input.toDF(), "event_id", lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(Ev(ts(1), "view", 1.0, 100), Ev(ts(2), "view", 2.0, 100),
        Ev(ts(3), "click", 3.0, 101))
      q.processAllAvailable()
      input.addData(Ev(ts(4), "view", 9.0, 100)) // still duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(100L, 101L))
    } finally q.stop()
  }
}
