package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("installed SQL functions match the Column API bit-for-bit and stay codegen'd") {
    GraftExtensions.installInto(spark)
    import spark.implicits._
    Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), "The quick brown fox"))
      .toDF("a", "b", "t").createOrReplaceTempView("ext_probe")
    val row = spark.sql(
      """SELECT vec_dot(a, b) AS d, vec_norm(a) AS n,
        |       fnv_fingerprint(t) AS f, simhash64(t) AS s
        |FROM ext_probe""".stripMargin).collect().head
    assert(row.getDouble(0) == 32.0)
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    val viaColumns = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), "The quick brown fox"))
      .toDF("a", "b", "t")
      .select(
        graft.vector.expressions.VectorExpressions.vecDot(col("a"), col("b")),
        graft.functions.expressions.TextExpressions.fnvFingerprint(col("t")),
        graft.functions.expressions.TextExpressions.simhash64(col("t")))
      .collect().head
    assert(row.getDouble(0) == viaColumns.getDouble(0))
    assert(row.getLong(2) == viaColumns.getLong(1))
    assert(row.getLong(3) == viaColumns.getLong(2))
    // still the native expression tier — no UDF appears in the SQL plan
    val plan = spark.sql("SELECT vec_dot(a, b) FROM ext_probe")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // shingle_hashes: SQL form matches the Column API and rejects
    // a non-literal width
    val sh = spark.sql("SELECT shingle_hashes(t, 2) AS h FROM ext_probe")
      .collect().head.getSeq[Long](0)
    val shCol = Seq(("The quick brown fox")).toDF("t")
      .select(graft.functions.expressions.TextExpressions.shingleHashes(col("t"), 2))
      .collect().head.getSeq[Long](0)
    assert(sh == shCol && sh.length == 3)
    assertThrows[Exception](
      spark.sql("SELECT shingle_hashes(t, a) FROM ext_probe").collect())
    // vec_lsh_signatures: SQL form matches the Column API (same plane
    // cache keyed by (seed, tables, bits, dim)) and rejects non-literal
    // plan-time constants
    val sig = spark.sql("SELECT vec_lsh_signatures(a, 4, 8, 42L) AS s FROM ext_probe")
      .collect().head.getSeq[Long](0)
    val sigCol = Seq(Seq(1f, 2f, 3f)).toDF("a")
      .select(graft.vector.expressions.VectorExpressions
        .vecLshSignatures(col("a"), tables = 4, bits = 8, seed = 42L))
      .collect().head.getSeq[Long](0)
    assert(sig == sigCol && sig.length == 4)
    assertThrows[Exception](
      spark.sql("SELECT vec_lsh_signatures(a, 4, 8, vec_dot(a, a)) FROM ext_probe")
        .collect())
  }

  test("extension class injects the same table (arity errors included)") {
    val names = GraftExtensions.functions.map(_._1.funcName).toSet
    assert(names == Set("vec_dot", "vec_norm", "fnv_fingerprint", "simhash64",
      "shingle_hashes", "vec_lsh_signatures"))
    val vecDotBuilder = GraftExtensions.functions.find(_._1.funcName == "vec_dot").get._3
    intercept[IllegalArgumentException](vecDotBuilder(Seq.empty))
  }
}
