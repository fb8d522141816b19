package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for operations not expressible with built-in
  * functions: per-document rolling hash and 64-bit SimHash. Registered in the
  * session FunctionRegistry and invoked via `call_function`, so they
  * participate in the Catalyst plan like any scalar function (evaluated on
  * executors, streaming over rows — no driver collect).
  */
object GraftExpressions {

  /** Polynomial rolling hash over UTF-8 bytes: h = h*257 + b (mod 1e9+7).
    * The content-defined fingerprint primitive for shift-tolerant dedup.
    */
  case class RollingHash(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = (h * 257 + (bytes(i) & 0xff)) % 1000000007L
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
    override protected def withNewChildInternal(newChild: Expression): RollingHash =
      copy(child = newChild)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 64-bit token hash: the first 8 bytes of md5 (big-endian) — equal to
    * parsing the first 16 hex chars of the md5 digest, which makes the hash
    * engine-portable (the DuckDB oracle computes the identical value with
    * `CAST('0x' || substr(md5(t), 1, 8 | 9, 8) AS BIGINT)`), the same
    * portability trick the MinHash lanes use.
    */
  def md5Half64(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** 64-bit SimHash over an array of token strings: per-bit vote of each
    * token's md5-derived hash ([[md5Half64]]); bit set iff the vote is
    * positive. Empty/null token arrays hash to 0.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = md5Half64(arr.getUTF8String(i).getBytes)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (votes(b) > 0) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Strict sequential left-fold dot product over two numeric arrays in
    * double precision — bit-identical to `list_reduce(list_prepend(0.0,
    * products), +)` in the DuckDB oracle, but a tight loop instead of
    * per-element interpreted lambdas (higher-order functions are not
    * codegen'd; measured ~5× on 64-dim vectors).
    */
  abstract class BinaryVectorFold extends Expression with CodegenFallback {
    def left: Expression
    def right: Expression
    override def children: Seq[Expression] = Seq(left, right)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    protected def combine(x: Double, y: Double): Double
    private def num(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
      case FloatType => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case IntegerType => arr.getInt(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case _ => throw new IllegalArgumentException(s"unsupported element type $dt")
    }
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = left.eval(input)
      val b = right.eval(input)
      if (a == null || b == null) return null
      val aa = a.asInstanceOf[ArrayData]
      val bb = b.asInstanceOf[ArrayData]
      val at = left.dataType.asInstanceOf[ArrayType].elementType
      val bt = right.dataType.asInstanceOf[ArrayType].elementType
      val n = math.min(aa.numElements(), bb.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += combine(num(aa, i, at), num(bb, i, bt))
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
  }

  /** Σ aᵢ·bᵢ (sequential, double). */
  case class DotProduct(left: Expression, right: Expression) extends BinaryVectorFold {
    protected def combine(x: Double, y: Double): Double = x * y
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): DotProduct =
      copy(left = c(0), right = c(1))
  }

  /** Σ (aᵢ−bᵢ)² (sequential, double). */
  case class L2Squared(left: Expression, right: Expression) extends BinaryVectorFold {
    protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): L2Squared =
      copy(left = c(0), right = c(1))
  }

  /** Register all graft scalar functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_rolling_hash", es => RollingHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_dot", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_l2sq", es => L2Squared(es(0), es(1)), "built-in")
  }

  // builders self-register on the active session (idempotent) so a bare
  // `Similarity.cosine(...)` works without a prior register() call
  private def ensureRegistered(): Unit = SparkSession.getActiveSession.foreach { s =>
    if (!s.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
      register(s)
  }

  def rollingHash(c: Column): Column = { ensureRegistered(); call_function("graft_rolling_hash", c) }
  def simHash64(c: Column): Column = { ensureRegistered(); call_function("graft_simhash64", c) }
  def dotProduct(a: Column, b: Column): Column = { ensureRegistered(); call_function("graft_dot", a, b) }
  def l2Squared(a: Column, b: Column): Column = { ensureRegistered(); call_function("graft_l2sq", a, b) }

  /** Hamming distance between two 64-bit simhashes (built-ins only). */
  def hammingDist64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
