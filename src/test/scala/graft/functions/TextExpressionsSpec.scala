package graft.functions.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextExpressionsSpec extends SparkSpec {

  test("fnv fingerprint: kernel matches known FNV-1a vectors") {
    // FNV-1a 64 of empty input is the offset basis
    assert(TextKernels.fnv64(UTF8String.fromString("")) == 0xcbf29ce484222325L)
    // classic test vector: fnv1a-64("a") = 0xaf63dc4c8601ec8c
    assert(TextKernels.fnv64(UTF8String.fromString("a")) == 0xaf63dc4c8601ec8cL)
  }

  test("expressions evaluate through codegen and match the kernel") {
    import spark.implicits._
    val df = Seq("hello world", "HELLO WORLD", "", "42 !").toDF("t")
    val out = df.select(
      TextExpressions.fnvFingerprint(col("t")).as("fnv"),
      TextExpressions.simhash64(col("t")).as("sh")).collect()
    out.zip(Seq("hello world", "HELLO WORLD", "", "42 !")).foreach { case (r, s) =>
      assert(r.getLong(0) == TextKernels.fnv64(UTF8String.fromString(s)))
      assert(r.getLong(1) == TextKernels.simhash64(UTF8String.fromString(s)))
    }
    // simhash is case-insensitive by construction (lowercase tokenization)
    assert(out(0).getLong(1) == out(1).getLong(1))
    // but fnv is byte-exact, so case changes it
    assert(out(0).getLong(0) != out(1).getLong(0))
  }

  test("null flows through as null (NullIntolerant unary)") {
    import spark.implicits._
    val df = Seq(Option("x"), None).toDF("t")
    val out = df.select(TextExpressions.fnvFingerprint(col("t"))).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }

  test("SQL registration exposes the functions to spark.sql") {
    TextExpressions.register(spark)
    val r = spark.sql("SELECT fnv_fingerprint('a') AS f, simhash64('a b') AS s").collect()(0)
    assert(r.getLong(0) == 0xaf63dc4c8601ec8cL)
    assert(r.getLong(1) == TextKernels.simhash64(UTF8String.fromString("a b")))
  }

  test("SQL registration arity-checks like the session-extension route: " +
      "wrong arity answers the 'expects' message, not IndexOutOfBounds") {
    TextExpressions.register(spark)
    def msgOf(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    assert(msgOf("SELECT fnv_fingerprint()").contains("expects 1 argument"))
    assert(msgOf("SELECT simhash64('a', 'b')").contains("expects 1 argument"))
    assert(msgOf("SELECT shingle_hashes('a')").contains("expects (text, n)"))
  }

  test("simhash: near-identical texts are close in hamming distance") {
    def d(a: String, b: String): Int = java.lang.Long.bitCount(
      TextKernels.simhash64(UTF8String.fromString(a)) ^
        TextKernels.simhash64(UTF8String.fromString(b)))
    val base = "the quick brown fox jumps over the lazy dog " * 5
    assert(d(base, base) == 0)
    assert(d(base, base.replace("lazy", "sleepy")) < 16)
    assert(d(base, "completely unrelated words about database engines and storage") > 16)
  }
}
