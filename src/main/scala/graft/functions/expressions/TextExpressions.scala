package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels shared by interpreted eval and generated code. Referenced
  * from codegen by fully-qualified name, so they must stay static-shaped
  * (object methods compile to static calls from Java).
  */
object TextKernels {

  /** FNV-1a 64-bit over the UTF-8 bytes of the string. */
  def fnv64(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L // FNV offset basis
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L // FNV prime
      i += 1
    }
    h
  }

  /** One-pass SimHash64: tokenizes lowercase alnum runs inline and votes
    * per bit with a 64-bit splitmix-style token hash — no intermediate
    * token array, no boxing.
    */
  def simhash64(s: UTF8String): Long = {
    val str = s.toString.toLowerCase
    val votes = new Array[Int](64)
    var i = 0
    val n = str.length
    while (i < n) {
      // scan one alnum run
      while (i < n && !isAlnum(str.charAt(i))) i += 1
      var h = 0xcbf29ce484222325L
      var seen = false
      while (i < n && isAlnum(str.charAt(i))) {
        h = (h ^ str.charAt(i)) * 0x100000001b3L
        seen = true
        i += 1
      }
      if (seen) {
        // finalize (splitmix64) then vote
        var z = h + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        var b = 0
        while (b < 64) {
          if (((z >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
}

/** Native Catalyst expression for the FNV-1a fingerprint: whole-stage
  * codegen emits a direct static call — no UDF boxing, no closure
  * serialization, stays inside the generated loop (a UDF would break the
  * codegen span). Preference order per SURVEY §7.3: built-in < Expression
  * < UDF; this is the Expression tier for the two text kernels that have
  * no built-in equivalent.
  */
case class FnvFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.fnv64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TextKernels.fnv64($c)")
  override protected def withNewChildInternal(c: Expression): FnvFingerprint = copy(c)
  override def prettyName: String = "fnv_fingerprint"
}

/** Native Catalyst expression for one-pass SimHash64 (tokenize + vote in
  * a single scan of the string).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

object TextExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def fnvFingerprint(c: Column): Column = column(FnvFingerprint(expression(c)))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))

  /** Register both as SQL functions on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_fingerprint", exprs => FnvFingerprint(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
  }
}
