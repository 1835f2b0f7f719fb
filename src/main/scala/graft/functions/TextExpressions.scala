package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash over a token array (Charikar's similarity-preserving hash,
  * public construction): hash each token with xxHash64, accumulate ±1 per
  * bit position weighted by token occurrence, emit the 64-bit sign vector.
  * Near-duplicate documents differ in few bits (small Hamming distance).
  *
  * Done as one native expression rather than 64 composed higher-order
  * lambdas: O(tokens) per row with zero boxing, and the token hashing
  * reuses Spark's own XxHash64 kernel so results are stable across
  * sessions/versions of this library.
  */
case class SimHash64(child: Expression, seed: Long = 42L)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        val h = XxHash64Function.hash(tok, StringType, seed)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) sig |= (1L << j); j += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}
