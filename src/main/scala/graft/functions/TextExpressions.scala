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

/** Single-pass byte-lane checksum: result[j] = Σ byte values at UTF-8
  * byte offsets p with (p % (nLanes·group)) / group == j. One traversal
  * of the string for ALL lanes — the scale form of the multimodal
  * feature/resize lane algebra, which as composed higher-order functions
  * costs one filter+aggregate pass PER lane (O(nLanes·len) vs O(len)).
  * Byte-based like the codec ([[graft.multimodal.Multimodal.FakeCodec]]
  * reads `getBytes("UTF-8")`); on the ASCII fixtures bytes == chars, so
  * the DuckDB char-position oracle stays hash-identical.
  *
  * Generated code calls [[sumsBoxed]] on the instance (the
  * HyperplaneSignature pattern): the row stays inside the enclosing
  * whole-stage-codegen span, and the hot loop is tight JVM bytecode over
  * the raw byte array with zero boxing. */
case class LaneSums(child: Expression, nLanes: Int, group: Int = 1)
    extends UnaryExpression {
  require(nLanes > 0 && group > 0, "nLanes and group must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def sumsBoxed(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val sums = new Array[Long](nLanes)
    val period = nLanes * group
    var i = 0
    while (i < bytes.length) {
      sums((i % period) / group) += (bytes(i) & 0xFF).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sums)
  }

  override def nullSafeEval(v: Any): Any =
    sumsBoxed(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val self = ctx.addReferenceObj("laneSums", this,
      classOf[LaneSums].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.sumsBoxed($v);")
  }

  override protected def withNewChildInternal(c: Expression): LaneSums =
    copy(child = c)
}
