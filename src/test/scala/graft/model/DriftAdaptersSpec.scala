package graft.model

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-8 generalization of the drift defense (EventsTsDriftSpec pins the
  * events.ts timestamp forms): every driver table now has a declared
  * canonical logical schema in [[DriftAdapters]], reached through
  * [[Domain.table]], so a regenerated parquet with a changed physical
  * type is coerced (or fails loudly) at the single choke point instead of
  * surfacing as a mid-round schema mismatch in whichever query reads the
  * column first.
  */
class DriftAdaptersSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("documents: BINARY text and INT32 ids coerce to the canonical schema") {
    val dir = tmp("doc-drift")
    Seq((1, "alpha beta", "en", "web", 10), (2, "gamma", "de", "book", 5))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .withColumn("text", col("text").cast(BinaryType))
      .withColumn("lang", col("lang").cast(BinaryType))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Domain.documents(spark, dir)
    assert(df.schema("doc_id").dataType == LongType)
    assert(df.schema("n_chars").dataType == LongType)
    assert(df.schema("text").dataType == StringType)
    assert(df.schema("lang").dataType == StringType)
    val row = df.filter(col("doc_id") === 1L)
      .select("text", "lang").as[(String, String)].head()
    assert(row == ("alpha beta", "en"))
  }

  test("documents: the canonical physical form passes through with no casts in the plan") {
    val dir = tmp("doc-native")
    Seq((1L, "alpha", "en", "web", 5L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Domain.documents(spark, dir)
    assert(!df.queryExecution.analyzed.toString.contains("cast("))
  }

  test("events: plain INT64 micros (no timestamp annotation) is detected and scaled to nanos") {
    // ADVICE r7: before the magnitude guard this form passed through
    // 1000x off, silently shifting every pulse bucket.
    val dir = tmp("ts-micros-long")
    val baseMicros = 1705300200000000L
    Seq((1L, baseMicros, 10L, "view", 1.5),
        (2L, baseMicros + 1000000L, 11L, "click", 2.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Domain.events(spark, dir)
    assert(df.schema("ts").dataType == LongType)
    val got = df.select("event_id", "ts").as[(Long, Long)].collect().toMap
    assert(got(1L) == baseMicros * 1000L)
    assert(got(2L) == (baseMicros + 1000000L) * 1000L)
  }

  test("events: INT64 seconds and millis scale to nanos too") {
    val sec = 1705300200L
    for ((unit, mult) <- Seq("sec" -> 1L, "millis" -> 1000L)) {
      val dir = tmp(s"ts-$unit-long")
      Seq((1L, sec * mult, 10L, "view", 1.5))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Domain.events(spark, dir).select("ts").as[Long].head()
      assert(got == sec * 1000000000L, s"unit=$unit")
    }
  }

  test("a regenerated events file at the SAME path re-detects its ts scale on invalidate") {
    // the epoch-scale memo is per-path; without eviction a rewrite from
    // micros to nanos would keep the x1000 multiplier and blow every ts
    // up 1000x. RelationCache.invalidate is the rewrite signal every
    // writer already sends — the memo must ride it.
    val dir = tmp("ts-regen")
    val sec = 1705300200L
    Seq((1L, sec * 1000000L, 10L, "view", 1.5)) // micros
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(Domain.events(spark, dir).select("ts").as[Long].head() == sec * 1000000000L)
    Seq((1L, sec * 1000000000L, 10L, "view", 1.5)) // regenerated: nanos
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.sources.RelationCache.invalidate(s"$dir/events.parquet")
    assert(Domain.events(spark, dir).select("ts").as[Long].head() == sec * 1000000000L,
      "the stale micros multiplier must not survive the rewrite")
  }

  test("events: an implausible INT64 ts magnitude fails loudly instead of guessing") {
    val dir = tmp("ts-bogus")
    Seq((1L, 12345L, 10L, "view", 1.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Domain.events(spark, dir))
    assert(e.getMessage.contains("no epoch unit is plausible"))
  }

  test("lineitem: DECIMAL measure columns coerce to DOUBLE so aggregate result types hold") {
    val dir = tmp("li-drift")
    Seq((1L, 17.0, 1000.50, 0.04, 0.02, "N", "O"),
        (2L, 36.0, 2500.25, 0.10, 0.05, "R", "F"))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus")
      .withColumn("l_quantity", col("l_quantity").cast(DecimalType(12, 2)))
      .withColumn("l_extendedprice", col("l_extendedprice").cast(DecimalType(12, 2)))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val df = Domain.table(spark, dir, "lineitem")
    assert(df.schema("l_quantity").dataType == DoubleType)
    assert(df.schema("l_extendedprice").dataType == DoubleType)
    val s = df.agg(sum("l_quantity")).schema.head.dataType
    assert(s == DoubleType, s"sum over coerced quantity must stay DOUBLE, got $s")
  }

  test("eventsInPulseRange bounds identically under every ts physical form") {
    // be_jet_links serves through this accessor; a driver regeneration
    // that flips the physical form must not change which rows the pulse
    // bound admits (nor their normalized nanos values). Rows straddle
    // the bound on both sides so an off-by-one in any branch's literal
    // conversion shows up as a row-count change.
    val pulse = 473500L
    val loNs = pulse * Domain.PulseNs
    // straddle values are whole MICROS so every physical form (micros
    // precision included) round-trips the same instants losslessly
    val tsNs = Seq(loNs - 1000L, loNs, loNs + Domain.PulseNs,
      loNs + 2L * Domain.PulseNs - 1000L, loNs + 2L * Domain.PulseNs)
    val base = tsNs.zipWithIndex.map { case (ns, i) =>
      (i.toLong, ns, 10L + i, "view", 1.0)
    }.toDF("event_id", "ts_ns", "user_id", "event_type", "value")
    val forms: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "nanos-long" -> (_.withColumn("ts", col("ts_ns"))),
      "micros-long" -> (_.withColumn("ts", expr("ts_ns DIV 1000"))),
      "ntz" -> (_.withColumn("ts",
        timestamp_micros(expr("ts_ns DIV 1000")).cast(TimestampNTZType))),
      "ltz" -> (_.withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))))
    for ((label, mkTs) <- forms) {
      val dir = tmp(s"range-$label")
      mkTs(base).drop("ts_ns")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Domain.eventsInPulseRange(spark, dir, pulse, pulse + 2L)
        .select("event_id", "ts").as[(Long, Long)].collect().toMap
      // rows 1, 2, 3 are in [pulse, pulse+2); 0 and 4 are outside
      assert(got.keySet == Set(1L, 2L, 3L), s"form=$label got=${got.keySet}")
      assert(got(1L) == loNs && got(3L) == loNs + 2L * Domain.PulseNs - 1000L,
        s"form=$label must normalize to exact epoch nanos")
    }
  }

  test("the events accessor asserts the drift-defense session configs instead of setting them") {
    // a session built without the configs must fail at the first events
    // read with an actionable message — not resolve a wrong-schema scan
    val bare = spark.newSession()
    bare.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val e = intercept[IllegalStateException](
      Domain.events(bare, "/root/testdata/sf0.001"))
    assert(e.getMessage.contains("nanosAsLong"))
    assert(e.getMessage.contains("Sessions.withDriftDefaults"))
  }
}
