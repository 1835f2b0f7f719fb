package graft.query

import graft.{SparkSuite, TestSpark}

/** The distributed exact-integer power iteration must equal a direct
  * single-JVM run of the identical integer algebra (the oracle's
  * half), and behave like power iteration: successive directions
  * converge monotonically on the PSD second-moment matrix. */
class PowerIterSpec extends SparkSuite {

  private val dir = TestSpark.sfDir
  private val Dim = 64

  private def quantized: Seq[Array[Long]] =
    graft.core.Tables.load(spark, dir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x =>
        math.floor(x.toDouble * 10000).toLong)).toSeq

  private def matvec(q: Seq[Array[Long]], v: Array[Long]): Array[Long] = {
    val y = new Array[Long](Dim)
    q.foreach { qi =>
      var dot = 0L
      var d = 0
      while (d < Dim) { dot += qi(d) * v(d); d += 1 }
      d = 0
      while (d < Dim) { y(d) += qi(d) * dot; d += 1 }
    }
    y
  }

  private def renorm(y: Array[Long]): Array[Long] = {
    val m = y.map(math.abs).max
    y.map(v => v * 1024L / m)
  }

  test("distributed result equals the direct integer computation") {
    val q = quantized
    val s = Array.tabulate(Dim)(d => (d % 7 - 3).toLong)
    val want = renorm(matvec(q, renorm(matvec(q, s))))
    val got = PowerIter.embedPowerIter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === Dim)
    (0 until Dim).foreach(d =>
      assert(got(d.toLong) === want(d), s"dim $d diverges"))
  }

  test("embedPca2: distributed deflated direction equals the direct " +
      "integer computation and is near-orthogonal to the first") {
    val q = quantized
    val s = Array.tabulate(Dim)(d => (d % 7 - 3).toLong)
    val first = renorm(matvec(q, renorm(matvec(q, s))))
    val rr = first.map(v => v * v).sum
    val defl = q.map { qi =>
      var dot = 0L
      (0 until Dim).foreach(d => dot += qi(d) * first(d))
      Array.tabulate(Dim)(d => qi(d) * rr - dot * first(d))
    }
    val m = defl.map(_.map(math.abs).max).max
    var k = 0
    while ((m >> k) > 20000L) k += 1
    def sshift(v: Long): Long = if (v >= 0) v >> k else -((-v) >> k)
    val q2 = defl.map(_.map(sshift))
    val want = renorm(matvec(q2, renorm(matvec(q2, s))))
    val got = PowerIter.embedPca2(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === Dim)
    (0 until Dim).foreach(d =>
      assert(got(d.toLong) === want(d), s"dim $d diverges"))
    // near-orthogonality: exact orthogonality is lost to the shift
    // truncation by design, but the residual must be tiny
    val dot12 = first.zip(want).map { case (a, b) => a.toDouble * b }.sum
    val cos = dot12 / math.sqrt(
      first.map(x => x.toDouble * x).sum * want.map(x => x.toDouble * x).sum)
    assert(math.abs(cos) < 0.05, s"second component not orthogonal: $cos")
  }

  test("power-iteration convergence: successive directions align " +
      "monotonically (PSD second-moment matrix)") {
    val q = quantized
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / math.sqrt(a.map(x => x.toDouble * x).sum *
        b.map(x => x.toDouble * x).sum)
    }
    val s = Array.tabulate(Dim)(d => (d % 7 - 3).toLong)
    val v1 = renorm(matvec(q, s))
    val v2 = renorm(matvec(q, v1))
    val v3 = renorm(matvec(q, v2))
    // |cos| rises toward 1 as iterates settle into the dominant
    // eigenspace (PSD: no sign-flip oscillation in the limit)
    assert(math.abs(cos(v2, v3)) >= math.abs(cos(v1, v2)) - 1e-9,
      s"alignment regressed: ${cos(v1, v2)} -> ${cos(v2, v3)}")
    assert(math.abs(cos(v2, v3)) > 0.9,
      "two iterations failed to settle anywhere near a direction")
  }
}
