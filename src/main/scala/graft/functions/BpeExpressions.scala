package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding segmentation of ONE word against a learned merge
  * table (the public BPE construction: Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL
  * 2016). The word starts as its character sequence plus the
  * end-of-word marker; the lowest-RANK adjacent pair present is merged
  * (all occurrences, left to right) until no ranked pair remains —
  * equivalent to applying the merges in training order, the standard
  * encode. Every character is a base symbol, so unseen words segment
  * fine (no UNK).
  *
  * An expression, not a UDF, and applied at VOCAB grain by
  * [[graft.query.Bpe]]: the corpus' distinct words are segmented once
  * and broadcast back — the per-row work in the document-sized plan is
  * a map lookup, not a merge loop. The merge table (≤ a few thousand
  * string pairs) rides the serialized expression like any literal
  * model. */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(v: Any): Any = {
    val word = v.asInstanceOf[UTF8String].toString
    new GenericArrayData(
      encode(word).map(s => UTF8String.fromString(s): Any))
  }

  private def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array(graft.query.Bpe.EndOfWord)
    var symbols: Array[String] =
      word.map(_.toString).toArray :+ graft.query.Bpe.EndOfWord
    var done = false
    while (!done && symbols.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < symbols.length - 1) {
        val r = rank.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](
          symbols.length)
        var j = 0
        while (j < symbols.length) {
          if (j < symbols.length - 1 && symbols(j) == l &&
              symbols(j + 1) == r) {
            out += l + r
            j += 2
          } else {
            out += symbols(j)
            j += 1
          }
        }
        symbols = out.toArray
      }
    }
    symbols
  }

  override protected def withNewChildInternal(c: Expression)
      : BpeEncodeWord = copy(child = c)
}
