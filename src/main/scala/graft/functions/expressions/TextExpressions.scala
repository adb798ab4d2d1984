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
    // Locale.ROOT: default-locale toLowerCase diverges on ASCII under
    // tr/az JVM locales ('I' -> dotless 'ı'), breaking parity with
    // Spark's locale-independent lower() and the DuckDB oracles.
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
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
        val z = splitmix(h) // finalize, then vote
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

  @inline private def splitmix(h0: Long): Long = {
    var z = h0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One-pass rolling shingle hashes: tokenize lowercase alnum runs
    * inline, hash each token (FNV-1a + splitmix finalize), and emit one
    * 64-bit hash per n-token window (order-sensitive FNV combine over the
    * ring buffer). Equals the hash-space image of the relational
    * shingle pipeline (distinct window ↔ distinct hash, modulo 64-bit
    * collisions) with NO token rows, NO per-document sort, NO shuffle —
    * the whole shingle stage collapses into the scan's codegen loop.
    * Texts with fewer than n tokens yield an empty array.
    */
  def shingleHashes(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val len = str.length
    val ring = new Array[Long](n)
    var count = 0
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < len) {
      while (i < len && !isAlnum(str.charAt(i))) i += 1
      var h = 0xcbf29ce484222325L
      var seen = false
      while (i < len && isAlnum(str.charAt(i))) {
        h = (h ^ str.charAt(i)) * 0x100000001b3L
        seen = true
        i += 1
      }
      if (seen) {
        ring(count % n) = splitmix(h)
        count += 1
        if (count >= n) {
          var w = 0xcbf29ce484222325L
          var j = count - n
          while (j < count) { w = (w ^ ring(j % n)) * 0x100000001b3L; j += 1 }
          out += splitmix(w)
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.result())
  }
}

/** Native Catalyst expression for the FNV-1a fingerprint: whole-stage
  * codegen emits a direct static call — no UDF boxing, no closure
  * serialization, stays inside the generated loop (a UDF would break the
  * codegen span). Preference order per SURVEY §7.3: built-in < Expression
  * < UDF; this is the Expression tier for the two text kernels that have
  * no built-in equivalent.
  */
case class FnvFingerprint(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // declared input type, so a wrong-typed SQL argument fails ANALYSIS
  // with the clear "expects string" error instead of a mid-job
  // ClassCastException (interpreted) or Janino compile failure (codegen)
  // narrowed to the public DataType (AbstractDataType is private[sql];
  // Seq is covariant, so this satisfies ExpectsInputTypes.inputTypes)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.StringType)
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
case class SimHash64(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // narrowed to the public DataType (AbstractDataType is private[sql];
  // Seq is covariant, so this satisfies ExpectsInputTypes.inputTypes)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expressions.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  override def prettyName: String = "simhash64"
}

/** Native Catalyst expression for the one-pass rolling shingle-hash
  * array: the entire tokenize→shingle→hash pipeline inside whole-stage
  * codegen, replacing the posexplode + window-lead relational form on the
  * dedup hot paths (the window's per-document sort was the dominant cost
  * of dd_minhash / dd_ngram_jaccard).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  require(n >= 1, "shingle width must be >= 1")
  // narrowed to the public DataType (AbstractDataType is private[sql];
  // Seq is covariant, so this satisfies ExpectsInputTypes.inputTypes)
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.shingleHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.TextKernels.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

object TextExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def fnvFingerprint(c: Column): Column = column(FnvFingerprint(expression(c)))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def shingleHashes(c: Column, n: Int): Column = column(ShingleHashes(expression(c), n))

  /** Register the text natives as SQL functions on a session (the
    * session-extension route, [[graft.GraftExtensions]], exposes the same
    * set — keep the two lists in sync).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    // arity-checked like the GraftExtensions registrations (the doc above
    // says keep the two in sync): a wrong-arity SQL call must answer the
    // clear "expects …" error, not an IndexOutOfBounds/NoSuchElement
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_fingerprint", { exprs =>
        require(exprs.length == 1,
          s"fnv_fingerprint expects 1 argument, got ${exprs.length}")
        FnvFingerprint(exprs.head)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", { exprs =>
        require(exprs.length == 1,
          s"simhash64 expects 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", { exprs =>
        require(exprs.length == 2,
          s"shingle_hashes expects (text, n), got ${exprs.length} args")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_hashes n must be an integer literal, got $other")
        }
        ShingleHashes(exprs.head, n)
      }, "scala_udf")
  }
}
