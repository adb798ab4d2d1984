package graft.model

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The driver regenerates the testdata between rounds, and `events.ts` has
  * already shipped in two physical forms: INT64 TIMESTAMP(NANOS) (LongType
  * under the legacy `nanosAsLong` flag) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (TimestampNTZType — the round-6 regeneration,
  * which silently broke every `ts DIV n` query until round 7).
  * [[Domain.events]] is the single choke point that normalizes whatever
  * lands on disk to epoch-NANOS LongType; this spec pins that contract for
  * all three plausible forms so the next drift fails HERE, not in the
  * driver's correctness gate.
  */
class EventsTsDriftSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-15T06:30:00Z and one second later, as epoch micros.
  private val baseMicros = 1705300200000000L
  private val rows = Seq(
    (1L, baseMicros, 10L, "view", 1.5),
    (2L, baseMicros + 1000000L, 11L, "click", 2.5))

  private def writeAndRead(writeTs: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("ts-drift").toString
    val base = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
    writeTs(base).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Domain.events(spark, dir)
  }

  private def assertNanos(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.schema("ts").dataType == LongType)
    val got = df.select("event_id", "ts").as[(Long, Long)].collect().toMap
    assert(got(1L) == baseMicros * 1000L)
    assert(got(2L) == (baseMicros + 1000000L) * 1000L)
    // the downstream contract: integer pulse bucketing resolves
    val pulses = df.select(expr(s"CAST(ts DIV ${Domain.PulseNs} AS BIGINT)").as("p"))
      .distinct().as[Long].collect()
    assert(pulses.toSeq == Seq(baseMicros * 1000L / Domain.PulseNs))
  }

  test("ts as raw epoch-nanos LongType passes through unchanged") {
    assertNanos(writeAndRead(_.withColumn("ts", col("ts_us") * lit(1000L))))
  }

  test("ts as TIMESTAMP_NTZ (micros, round-6 driver form) normalizes to nanos") {
    assertNanos(writeAndRead(
      _.withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))))
  }

  test("ts as session-zoned TIMESTAMP (micros) normalizes to nanos") {
    assertNanos(writeAndRead(
      _.withColumn("ts", timestamp_micros(col("ts_us")))))
  }

  test("events.value coerces to DOUBLE when the file carries another numeric type") {
    val dir = Files.createTempDirectory("ts-drift").toString
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_us") * lit(1000L)).drop("ts_us")
      .withColumn("value", col("value").cast(DecimalType(10, 3)))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Domain.events(spark, dir)
    assert(df.schema("value").dataType == DoubleType)
    assert(df.agg(sum("value")).as[Double].head() == 4.0)
  }

  test("embeddings.embedding coerces to ARRAY<FLOAT> from a double-element file") {
    val dir = Files.createTempDirectory("emb-drift").toString
    Seq((1L, Seq(1.0d, 0.0d), 0), (2L, Seq(0.5d, 0.5d), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Domain.embeddings(spark, dir)
    assert(df.schema("embedding").dataType == ArrayType(FloatType, containsNull = true))
    val v = df.filter(col("vec_id") === 2L).select("embedding")
      .as[Seq[Float]].head()
    assert(v == Seq(0.5f, 0.5f))
  }

  test("embeddings with native float elements pass through without a cast") {
    val dir = Files.createTempDirectory("emb-native").toString
    Seq((1L, Seq(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Domain.embeddings(spark, dir)
    assert(df.schema("embedding").dataType.asInstanceOf[ArrayType].elementType == FloatType)
    assert(df.queryExecution.analyzed.toString.indexOf("cast(embedding") < 0)
  }
}
