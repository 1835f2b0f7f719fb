package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a [[TypedImperativeAggregate]]
  * (the [[TopKPairs]] pattern): at most `k` (item, counter) pairs per
  * group at all times — fixed memory, map-side partial aggregation, and
  * the merge subtracts the (k+1)-th largest combined counter (the
  * Agarwal et al. mergeable-summaries rule), which preserves the MG
  * deterministic guarantee end-to-end:
  *
  *   ANY item with true frequency f where (k+1)·f > n (n = stream
  *   length) IS in the final summary, REGARDLESS of input order,
  *   partitioning, or merge tree.
  *
  * The exact survivor set and counters below that bar DO depend on
  * merge order, so query keys built on this sketch must expose only
  * the order-free guarantee (membership of true heavy hitters), never
  * raw counters — `Sketches.heavyHitters` does exactly that. At 100 TB
  * the shuffle carries ≤ k pairs per (task, group) instead of the
  * stream; the decrement step amortizes O(1) per update. */
case class MisraGriesItems(
    item: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with ImplicitCastInputTypes {
  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      // keys stay UTF8String: the hot path (incrementing an already-
      // tracked item — at most k live keys, so virtually every update
      // past warm-up) does a byte-hash lookup with ZERO allocation;
      // only an INSERT clones, detaching the key from the reused row
      // buffer. String materialization happens once per group at eval.
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s.clone(), 1L)
        case None =>
          // decrement-all: drop one count from every tracked item
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (s, c) =>
      buf.update(s, buf.getOrElse(s, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0
      val d = buf.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.foreach { case (key, c) =>
        if (c - d <= 0L) dead += key else buf.update(key, c - d)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Survivor items only (sorted for a stable value) — counters are
    * merge-order-dependent lower bounds and deliberately not exposed.
    * Sorted AS STRINGS (UTF-16 order), exactly as the String-keyed
    * form did, so the output array order is bit-identical. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(buf.keys.map(_.toString).toArray.sorted
      .map(UTF8String.fromString(_)).toArray[Any])

  override def serialize(buf: mutable.HashMap[UTF8String, Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed UTF-8, not writeUTF: modified-UTF-8 caps at
    // 65535 bytes and would throw for a long item mid-shuffle
    buf.foreach { case (s, c) =>
      val b = s.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var j = 0
    while (j < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesItems =
    copy(item = newChildren(0))
}
