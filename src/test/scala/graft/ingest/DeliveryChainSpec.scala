package graft.ingest

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The multi-delivery append chain the delta indexes stand on
  * (MinhashIndex / EmbeddingIndex / VocabStore / SubstringIndex /
  * SemanticIndex all claim "any number of deliveries"): three
  * successive O(delta) commits through one SnapshotStore, asserting
  * the live read is always the full union, the retention window keeps
  * exactly live + previous, and the PREVIOUS version — what
  * SubstringIndex probes as the pre-delivery state — is the union of
  * everything before the newest delivery even after older manifests
  * are GC'd (append chains share data dirs; manifests retire, dirs
  * are reference-kept). */
class DeliveryChainSpec extends SparkSuite {

  import spark.implicits._

  private def delivery(ids: Range) =
    ids.map(i => (i.toLong, s"g$i")).toDF("doc_id", "v")

  test("three deliveries: union reads, retention window, pre-delivery probe") {
    val store = new SnapshotStore(
      "target/graft-chain-spec/" + java.util.UUID.randomUUID())
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    store.overwrite(delivery(0 until 10))            // base
    assert(ids(store.read(spark).get) === (0L until 10L))

    store.append(delivery(10 until 15))              // delivery 1
    assert(ids(store.read(spark).get) === (0L until 15L))
    val vsAfter1 = store.versions(spark)
    assert(vsAfter1.size === 2)
    // pre-delivery probe = previous version = the base alone
    assert(ids(store.readAt(spark, vsAfter1(vsAfter1.size - 2)).get)
      === (0L until 10L))

    store.append(delivery(15 until 18))              // delivery 2
    assert(ids(store.read(spark).get) === (0L until 18L),
      "append chain lost rows after the third commit")
    val vs = store.versions(spark)
    assert(vs.size === 2, s"retention drifted: $vs")
    // the GC retired the base manifest, but the previous version —
    // base ∪ delivery 1 — still reads whole (shared dirs kept)
    assert(ids(store.readAt(spark, vs(vs.size - 2)).get)
      === (0L until 15L))
    // and the retired base version is genuinely gone (time travel is
    // a bounded window, not an archive)
    assert(store.readAt(spark, vsAfter1.head).isEmpty
      || vsAfter1.head == vs.head)
  }
}
