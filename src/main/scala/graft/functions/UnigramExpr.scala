package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared unigram-LM segmentation mechanics — the ONE Viterbi both
  * training (driver-side hard-EM loop over the bounded word table,
  * [[graft.ext.UnigramLm]]) and application ([[UnigramEncode]],
  * executor-side per document) run, so a trained model reproduces its
  * own fit segmentations exactly (the [[BpeCore]] contract for the
  * other subword family).
  */
object UnigramCore {

  /** Score assigned to a single character absent from the vocabulary —
    * apply-time unknown handling (training guarantees coverage of its
    * own corpus by always retaining single code points, but novel text
    * may carry novel characters; they pass through as one-char pieces
    * at this fixed penalty). Far below any real log-probability, so an
    * in-vocab segmentation always wins where one exists.
    */
  val UnkScore: Double = -1000.0

  /** Viterbi-best segmentation of one word under piece log-scores:
    * maximize the score sum over pieces of length ≤ `maxPieceLen`
    * (code-point lengths — a piece never splits an astral character).
    * DETERMINISTIC tie-break: on an exact score tie the LONGER final
    * piece wins (fewer-pieces bias), which both the trainer's E-step
    * and the apply expression share by calling this one method.
    */
  def viterbi(word: String, scores: java.util.HashMap[String, java.lang.Double],
              maxPieceLen: Int): Array[String] = {
    val cps = BpeCore.codepointStrings(word)
    val n = cps.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // piece length chosen ending at i
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        if (best(i - l) != Double.NegativeInfinity) {
          val piece = join(cps, i - l, i)
          val s0 = scores.get(piece)
          val s: Double =
            if (s0 != null) s0.doubleValue()
            else if (l == 1) UnkScore
            else Double.NaN
          if (!java.lang.Double.isNaN(s)) {
            val cand = best(i - l) + s
            if (cand > best(i) || (cand == best(i) && l > back(i))) {
              best(i) = cand
              back(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    // reconstruct (best(n) is finite: l=1 always admissible via UnkScore)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val l = back(p)
      out += join(cps, p - l, p)
      p -= l
    }
    out.reverseIterator.toArray
  }

  private def join(cps: Array[String], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = from
    while (i < until) { sb.append(cps(i)); i += 1 }
    sb.toString
  }

  def scoresOf(pieces: Seq[(String, Double)]): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Double.valueOf(s)) }
    m
  }
}

/** Unigram-LM (SentencePiece-style) segmentation of a single-space-
  * tokenized text: each whitespace word is Viterbi-segmented under the
  * trained (piece, log-score) vocabulary and the pieces concatenate in
  * order — `array<string>` out, the column shape every
  * `tokensCol`/`tokenCount` seam accepts (packing, chunking, token
  * stats). Per-document expression, so CodegenFallback is the
  * [[BpeEncode]] precedent; the score map is built once per expression
  * instance, not per row. Empty text → empty array; the vocabulary is
  * closed over as an expression parameter (bounded — the trained
  * model, not data).
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Double)],
                         maxPieceLen: Int)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  @transient private lazy val scores = UnigramCore.scoresOf(pieces)

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.toString.split(" ")
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val ps = UnigramCore.viterbi(words(i), scores, maxPieceLen)
        var j = 0
        while (j < ps.length) {
          out += UTF8String.fromString(ps(j))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnigramExpr {
  /** Unigram-LM piece array of a text column under a trained model. */
  def unigramEncode(text: Column, pieces: Seq[(String, Double)],
                    maxPieceLen: Int): Column =
    ColumnBridge.column(UnigramEncode(ColumnBridge.expression(text), pieces, maxPieceLen))
}
