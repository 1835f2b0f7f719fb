package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (SURVEY.md §2 B16).
  *
  * A Scala UDF would box every element of every vector per row; these
  * expressions loop over the unsafe ArrayData directly (no boxing, no
  * Row conversion), which is the preferred extension point after built-in
  * functions (builder directive: native Expression > UDF). Kept
  * CodegenFallback for now — the eval path is already a tight primitive
  * loop; doGenCode is a later optimization.
  */
private[functions] trait VectorOps {
  protected def elemGetter(dt: DataType): (ArrayData, Int) => Double =
    dt match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(
          s"expected array<float|double>, got $other")
    }
}

/** cosine(a, b) = a·b / (|a| |b|); null on size mismatch or zero norm. */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - cosine similarity of two float/double arrays")
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with VectorOps {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val getL = elemGetter(left.dataType)
  @transient private lazy val getR = elemGetter(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b); null on size mismatch. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with VectorOps {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val getL = elemGetter(left.dataType)
  @transient private lazy val getR = elemGetter(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) { dot += getL(a, i) * getR(b, i); i += 1 }
    java.lang.Double.valueOf(dot)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: bit j of the result = sign(v · h_j)
  * for `nPlanes` (≤ 63) deterministic pseudo-random hyperplanes derived
  * from `seed`. Vectors with equal signatures are cosine-similar
  * candidates (Charikar, STOC'02 — public SimHash/LSH construction). */
case class HyperplaneSignature(child: Expression, nPlanes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback with VectorOps {
  require(nPlanes > 0 && nPlanes < 64)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val get = elemGetter(child.dataType)

  // one RNG stream per expression instance; deterministic in (seed, dim)
  @transient private var planes: Array[Array[Double]] = _

  private def planesFor(dim: Int): Array[Array[Double]] = {
    if (planes == null || planes(0).length != dim) {
      val rnd = new java.util.Random(seed)
      planes = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    }
    planes
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val hs = planesFor(n)
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      val h = hs(j)
      var dot = 0.0; var i = 0
      while (i < n) { dot += get(a, i) * h(i); i += 1 }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression)
      : HyperplaneSignature = copy(child = c)
}
