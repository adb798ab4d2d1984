package graft.functions

import graft.SparkSpec

class CodecsSpec extends SparkSpec {

  test("base58 round-trips arbitrary byte arrays including leading zeros") {
    for (seed <- 0 until 200) {
      val rnd = new scala.util.Random(seed)
      val len = rnd.nextInt(48)
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      if (len > 2 && seed % 3 == 0) { bytes(0) = 0; bytes(1) = 0 }
      val enc = Codecs.base58Encode(bytes)
      assert(Codecs.base58Decode(enc).get.toSeq == bytes.toSeq, s"seed=$seed")
    }
  }

  test("base58 known vector") {
    assert(Codecs.base58Encode("Hello".getBytes("UTF-8")) == "9Ajdvzr")
    assert(Codecs.base58Decode("9Ajdvzr").get.toSeq == "Hello".getBytes("UTF-8").toSeq)
  }

  test("base58 rejects invalid characters") {
    assert(Codecs.base58Decode("0OIl").isEmpty)
  }

  test("reference string round-trip") {
    val bytes = Array.tabulate[Byte](36)(_.toByte)
    val s = Codecs.referenceToString(bytes)
    assert(s.startsWith("insolar:1"))
    assert(Codecs.parseReference(s).get.toSeq == bytes.toSeq)
  }

  test("index cursor parse") {
    assert(Codecs.parseIndex("473700:5").contains((473700L, 5L)))
    assert(Codecs.parseIndex("no").isEmpty)
    assert(Codecs.parseIndex("1:2:3").isEmpty)
    assert(Codecs.parseIndex("a:b").isEmpty)
  }

  test("jet drop id parse: root stars and validation") {
    assert(Codecs.parseJetDropId("*:65536").contains(("", 65536L)))
    assert(Codecs.parseJetDropId("0101:70000").contains(("0101", 70000L)))
    assert(Codecs.parseJetDropId("012:70000").isEmpty) // not binary
    assert(Codecs.parseJetDropId("65536").isEmpty)
  }

  test("column codecs: index string and jet drop id rendering") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(("", 65536L, 1L), ("01", 70000L, 3L)).toDF("jet", "pulse", "ord")
    val out = df.select(
      Codecs.jetDropIdString(col("jet"), col("pulse")).as("jid"),
      Codecs.indexString(col("pulse"), col("ord")).as("idx")).collect()
    assert(out(0).getString(0) == "*:65536" && out(0).getString(1) == "65536:1")
    assert(out(1).getString(0) == "01:70000" && out(1).getString(1) == "70000:3")
  }

  test("NULL inputs never render as colon-less ids (concat_ws skips nulls)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a NULL jet id is the root (the reference's Go model scans SQL NULL
    // into ""); a NULL pulse/order yields a NULL cursor, never a bare
    // one-field string parseIndex can't read back
    val df = Seq((Option.empty[String], Option(65537L), Option.empty[Long]))
      .toDF("jet", "pulse", "ord")
    val out = df.select(
      Codecs.jetDropIdString(col("jet"), col("pulse")).as("jid"),
      Codecs.indexString(col("pulse"), col("ord")).as("idx")).collect().head
    assert(out.getString(0) == "*:65537",
      s"NULL jet must render as root, got ${out.getString(0)}")
    assert(out.isNullAt(1), "a NULL order must yield a NULL index, not '65537'")
  }

  test("empty refs normalize to null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1, Array[Byte](0, 0, 0)), (2, Array.emptyByteArray),
      (3, null.asInstanceOf[Array[Byte]]), (4, Array[Byte](0, 1)))
      .toDF("id", "ref")
    val out = df.select(col("id"), Codecs.emptyRefToNull(col("ref")).as("r"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && out(2).isNullAt(1))
    assert(!out(3).isNullAt(1))
  }
}
