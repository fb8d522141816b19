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

  /** FNV-1a 64-bit over UTF-8 bytes — deterministic word hash for SimHash. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over an array of token strings: per-bit vote of each
    * token's FNV-1a hash; bit set iff the vote is positive.
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
          val h = fnv1a64(arr.getUTF8String(i).getBytes)
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

  /** Register all graft scalar functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_rolling_hash", es => RollingHash(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64", es => SimHash64(es.head), "built-in")
  }

  def rollingHash(c: Column): Column = call_function("graft_rolling_hash", c)
  def simHash64(c: Column): Column = call_function("graft_simhash64", c)

  /** Hamming distance between two 64-bit simhashes (built-ins only). */
  def hammingDist64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
