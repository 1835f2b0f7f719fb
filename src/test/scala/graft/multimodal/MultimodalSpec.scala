package graft.multimodal

import graft.{SparkSuite, TestSpark}

/** The multimodal plumbing around the (clearly-marked) stub codec: the
  * distributed decode path must agree with a direct in-JVM run of the
  * same codec, proving the mapPartitions batch shape loses nothing. */
class MultimodalSpec extends SparkSuite {

  private val dir = TestSpark.sfDir

  test("featureNorms matches a direct single-JVM decode of the same payloads") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = docs.map { case (id, text) =>
      val m = Multimodal.FakeCodec.decode(id, text.getBytes("UTF-8"))
      id -> BigDecimal(
        math.sqrt(m.features.map(f => f.toDouble * f).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val actual = Multimodal.featureNorms(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(actual.keySet === expected.keySet)
    val mismatches = expected.collect {
      case (id, e) if math.abs(actual(id) - e) > 1e-6 => id
    }
    assert(mismatches.isEmpty, s"norm mismatch for docs $mismatches")
  }

  test("resizeFeatures average-pools exactly (distributed == direct)") {
    val out = Multimodal.resizeFeatures(spark, dir, outDim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.foreach { case (id, text) =>
      val f = Multimodal.FakeCodec.decode(id, text.getBytes("UTF-8")).features
      val expected = f.grouped(2).map(g => g.sum / g.length).toSeq
      assert(out(id).length === 4)
      out(id).zip(expected).foreach { case (a, e) =>
        assert(math.abs(a - e) < 1e-5f, s"doc $id pooled value off")
      }
    }
  }

  test("featureLanes (exact integer algebra) agrees with the float codec path") {
    val exact = Multimodal.featureLanes(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val float = Multimodal.featureNorms(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(exact.keySet === float.keySet)
    exact.foreach { case (id, (nBytes, norm)) =>
      assert(nBytes === float(id)._1.toLong, s"doc $id byte count")
      // float32 accumulation vs exact longs: agree within float tolerance
      assert(math.abs(norm - float(id)._2) < 1e-2,
        s"doc $id norm exact=$norm float=${float(id)._2}")
    }
  }

  test("resizeDigest pooled scalars agree with the float average-pool path") {
    val exact = Multimodal.resizeDigest(spark, dir, outDim = 4).collect()
      .map(r => r.getLong(0) -> (2 to 5).map(r.getDouble)).toMap
    val float = Multimodal.resizeFeatures(spark, dir, outDim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(exact.keySet === float.keySet)
    exact.foreach { case (id, pooled) =>
      pooled.zip(float(id)).foreach { case (e, f) =>
        assert(math.abs(e - f) < 1e-2, s"doc $id pooled exact=$e float=$f")
      }
    }
    // driver-hashable contract: no array columns in the query output
    val schema = Multimodal.resizeDigest(spark, dir).schema
    assert(schema.fields.forall(f =>
      !f.dataType.typeName.contains("array")), "raw array column leaked")
  }

  test("decodeFeatures keeps the fixed feature dimension and byte counts") {
    val out = Multimodal.decodeFeatures(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.features.length === Multimodal.FakeCodec.FeatureDim))
    assert(out.forall(m => m.n_bytes > 0))
  }
}
