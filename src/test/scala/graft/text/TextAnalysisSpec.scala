package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("tokenCount on plain and empty text") {
    import spark.implicits._
    val df = Seq("one two  three", "", "   ", "single").toDF("t")
    val out = df.select(TextAnalysis.tokenCount(col("t"))).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(3, 0, 0, 1))
  }

  test("quality features: ratios on a known string") {
    import spark.implicits._
    val df = Seq("AB cd 12!").toDF("t") // 9 chars: 2 upper, 2 digit, 1 punct
    val feats = TextAnalysis.qualityFeatures(col("t"))
    val out = df.select(feats.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(out.getAs[Long]("n_chars") == 9L)
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(math.abs(out.getAs[Double]("upper_ratio") - 2.0 / 9) < 1e-12)
    assert(math.abs(out.getAs[Double]("digit_ratio") - 2.0 / 9) < 1e-12)
    assert(math.abs(out.getAs[Double]("punct_ratio") - 1.0 / 9) < 1e-12)
  }

  test("languageId votes by stopwords; und for no hits") {
    import spark.implicits._
    val df = Seq(
      "the cat is in the house and it is warm",
      "der Hund ist nicht mit der Katze und das ist gut",
      "le chat est dans la maison et il est pour les amis",
      "xyzzy plugh 42").toDF("t")
    val out = df.select(TextAnalysis.languageId(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("qualityScore is 1.0 for clean prose and lower for junk") {
    import spark.implicits._
    val df = Seq(
      "this is a perfectly reasonable sentence with normal words inside",
      "0 1 2 3 4 5 6 7 8 9 !!!").toDF("t") // digit-heavy, 1-char words
    val out = df.select(TextAnalysis.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(out(0) == 1.0)
    assert(out(1) < 0.7)
  }

  test("rolling fingerprint is deterministic and content-sensitive") {
    assert(TextAnalysis.rollingFingerprint("abc") == TextAnalysis.rollingFingerprint("abc"))
    assert(TextAnalysis.rollingFingerprint("abc") != TextAnalysis.rollingFingerprint("abd"))
    import spark.implicits._
    val df = Seq("abc").toDF("t")
    assert(df.select(TextAnalysis.fingerprint(col("t"))).collect()(0).getLong(0)
      == TextAnalysis.rollingFingerprint("abc"))
  }
}
