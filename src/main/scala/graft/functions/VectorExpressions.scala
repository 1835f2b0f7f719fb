package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (SURVEY.md §2 B16).
  *
  * A Scala UDF would box every element of every vector per row; these
  * expressions loop over the unsafe ArrayData directly (no boxing, no
  * Row conversion), which is the preferred extension point after built-in
  * functions (builder directive: native Expression > UDF). The binary
  * ops implement `doGenCode`, so similarity scans stay inside one
  * whole-stage-codegen span — the generated Java is the same tight
  * primitive loop as the interpreted path.
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

  /** Java source for element i of ArrayData `arr`, as double. */
  protected def elemJava(dt: DataType, arr: String, i: String): String =
    dt match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
      case other =>
        throw new IllegalArgumentException(
          s"expected array<float|double>, got $other")
    }
}

/** cosine(a, b) = a·b / (|a| |b|); null on size mismatch or zero norm. */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - cosine similarity of two float/double arrays")
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with VectorOps {
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = nullSafeCodeGen(ctx, ev, (a, b) => {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    s"""
       |final int $n = $a.numElements();
       |if ($n != $b.numElements() || $n == 0) {
       |  ${ev.isNull} = true;
       |} else {
       |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    final double $x = ${elemJava(left.dataType, a, i)};
       |    final double $y = ${elemJava(right.dataType, b, i)};
       |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |  }
       |  if ($na == 0.0 || $nb == 0.0) {
       |    ${ev.isNull} = true;
       |  } else {
       |    ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       |  }
       |}
     """.stripMargin
  })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** dot(a, b); null on size mismatch. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorOps {
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = nullSafeCodeGen(ctx, ev, (a, b) => {
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    s"""
       |final int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  ${ev.isNull} = true;
       |} else {
       |  double $dot = 0.0;
       |  for (int $i = 0; $i < $n; $i++) {
       |    $dot += (${elemJava(left.dataType, a, i)}) *
       |      (${elemJava(right.dataType, b, i)});
       |  }
       |  ${ev.value} = $dot;
       |}
     """.stripMargin
  })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: bit j of the result = sign(v · h_j)
  * for `nPlanes` (≤ 63) deterministic pseudo-random hyperplanes derived
  * from `seed`. Vectors with equal signatures are cosine-similar
  * candidates (Charikar, STOC'02 — public SimHash/LSH construction). */
case class HyperplaneSignature(child: Expression, nPlanes: Int, seed: Long)
    extends UnaryExpression with VectorOps {
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

  /** Boxed signature; null for an empty vector. Called from both the
    * interpreted and the generated path (the plane cache lives on this
    * instance, so codegen references the instance rather than inlining
    * nPlanes × dim coefficients into Java source). */
  def signatureBoxed(v: ArrayData): java.lang.Long = {
    val n = v.numElements()
    if (n == 0) return null
    val hs = planesFor(n)
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      val h = hs(j)
      var dot = 0.0; var i = 0
      while (i < n) { dot += get(v, i) * h(i); i += 1 }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def nullSafeEval(v: Any): Any =
    signatureBoxed(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneSig", this,
      classOf[HyperplaneSignature].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val boxed = ctx.freshName("sig")
      s"""
         |final java.lang.Long $boxed = $self.signatureBoxed($v);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression)
      : HyperplaneSignature = copy(child = c)
}
