package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of ONE word under a unigram language model
  * over subword pieces (the public construction: Kudo, "Subword
  * Regularization", ACL 2018 — the SentencePiece unigram model's
  * maximum-likelihood decode): choose the tiling of the word by vocab
  * pieces that maximizes the sum of piece log-probabilities.
  *
  * Scores are FIXED-POINT (micro-nats, Long) — the trainer quantizes
  * its M-step the same way, so segmentation is bit-stable across runs,
  * partitionings, and platforms (no floating-point tie ambiguity).
  * Ties break deterministically: higher score, then FEWER pieces, then
  * the longer final piece. A character absent from the vocabulary
  * scores `floor` (the byte-fallback analogue — encoding is total, no
  * UNK).
  *
  * An expression, not a UDF, and applied at VOCAB grain by
  * [[graft.query.Unigram]]: the corpus' distinct words are segmented
  * once and broadcast back — per-row work in the document-sized plan
  * is a map probe. The piece table (≤ a few thousand entries) rides
  * the serialized expression like any literal model. */
case class UnigramEncodeWord(child: Expression,
    pieces: Seq[(String, Long)], floor: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val score: Map[String, Long] = pieces.toMap
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 1 else pieces.map(_._1.length).max

  override def nullSafeEval(v: Any): Any = {
    val word = v.asInstanceOf[UTF8String].toString
    new GenericArrayData(
      encode(word).map(s => UTF8String.fromString(s): Any))
  }

  private def encode(word: String): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    // best(i): (score, pieceCount, startOfLastPiece) for word[0,i)
    val bestScore = new Array[Long](n + 1)
    val bestCount = new Array[Int](n + 1)
    val bestBack = new Array[Int](n + 1)
    java.util.Arrays.fill(bestScore, Long.MinValue)
    bestScore(0) = 0L
    bestCount(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (bestScore(j) != Long.MinValue) {
          val piece = word.substring(j, i)
          val s = score.get(piece) match {
            case Some(lp) => Some(lp)
            case None => if (i - j == 1) Some(floor) else None
          }
          s.foreach { lp =>
            val cand = bestScore(j) + lp
            val candCount = bestCount(j) + 1
            val better = cand > bestScore(i) ||
              (cand == bestScore(i) && (candCount < bestCount(i) ||
                (candCount == bestCount(i) && j < bestBack(i))))
            if (better) {
              bestScore(i) = cand
              bestCount(i) = candCount
              bestBack(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    // single-char fallback guarantees reachability of every position
    val out = new Array[String](bestCount(n))
    var pos = n
    var k = bestCount(n) - 1
    while (pos > 0) {
      val j = bestBack(pos)
      out(k) = word.substring(j, pos)
      pos = j
      k -= 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression)
      : UnigramEncodeWord = copy(child = c)
}
