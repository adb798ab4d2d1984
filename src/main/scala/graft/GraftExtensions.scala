package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.{FnvFingerprint, ShingleHashes, SimHash64}
import graft.vector.expressions.{DotProduct, L2Norm}

/** Session-extension entry point: registers the library's native Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b) …")`
  * works for SQL-first users exactly like the Column API.
  *
  * Activate at session build time —
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — or on an
  * existing session via [[GraftExtensions.installInto]]. Both routes share
  * one function table, and every function stays a codegen'd native
  * expression (no UDF tier, SURVEY §7.3's preference order holds through
  * the SQL surface too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def one(name: String, clazz: Class[_], b: Expression => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (es: Seq[Expression]) => {
        require(es.length == 1, s"$name expects 1 argument, got ${es.length}")
        b(es.head)
      })

  private def two(name: String, clazz: Class[_], b: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"$name expects 2 arguments, got ${es.length}")
        b(es.head, es(1))
      })

  /** The SQL-exposed native expression table. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    two("vec_dot", classOf[DotProduct], DotProduct.apply),
    one("vec_norm", classOf[L2Norm], L2Norm.apply),
    one("fnv_fingerprint", classOf[FnvFingerprint], FnvFingerprint.apply),
    one("simhash64", classOf[SimHash64], SimHash64.apply),
    (FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (es: Seq[Expression]) => {
        require(es.length == 2, s"shingle_hashes expects (text, n), got ${es.length} args")
        ShingleHashes(es.head, intLit("shingle_hashes n", es(1)))
      }),
    (FunctionIdentifier("vec_lsh_signatures"),
      new ExpressionInfo(
        classOf[graft.vector.expressions.LshSignatures].getName, "vec_lsh_signatures"),
      (es: Seq[Expression]) => {
        require(es.length == 4,
          s"vec_lsh_signatures expects (vec, tables, bits, seed), got ${es.length} args")
        graft.vector.expressions.LshSignatures(es.head,
          intLit("vec_lsh_signatures tables", es(1)),
          intLit("vec_lsh_signatures bits", es(2)),
          longLit("vec_lsh_signatures seed", es(3)))
      }))

  // SQL literals for the kernels' plan-time constants: the expressions
  // fold these into the generated call (plane sets are keyed by them),
  // so a non-literal is a caller error worth a clear message, not a
  // MatchError out of the analyzer.
  private def intLit(what: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def longLit(what: String, e: Expression): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** Register the same functions on an already-built session. */
  def installInto(spark: SparkSession): Unit =
    functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
