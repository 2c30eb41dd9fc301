package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled Viterbi segmentation under a unigram language model
  * (Kudo 2018, the SentencePiece model family) — the second
  * production tokenizer family beside [[BpeEncodeMerges]] (BPE merges
  * greedily bottom-up; the unigram LM picks the GLOBALLY best
  * segmentation of each word under per-piece log-probabilities).
  *
  * One reference-object expression holds the whole (piece → score)
  * table; per word the DP is O(len · maxPieceLen) with zero
  * allocation beyond the two DP arrays — the
  * [[BpeEncodeMerges]]/[[PortableLn]] fusion discipline, inside
  * whole-stage codegen as a single static-call node.
  *
  * Bit-portability contract (what makes the full train+segment
  * differential oracle possible): scores are [[PortableSketches
  * .lnOfPosLong]] values (engine-identical doubles of integer
  * counts); the DP recurrence is ONE IEEE add per candidate
  * (`dp(j−l) + score(piece)`); the argmax total order is (sum DESC,
  * piece-length ASC) — a SQL `row_number() OVER (ORDER BY s DESC,
  * l ASC)` replays it exactly, candidate floats being bit-identical.
  *
  * Segmentation contract:
  *  - a word longer than `maxWordLen` (or empty) segments to NOTHING
  *    (null pieces / 0 tokens) — the training-domain cap, mirrored
  *    by the oracle's word-table filter;
  *  - a word with a character outside the vocabulary is
  *    unsegmentable → null/0 (cannot happen when training and
  *    segmentation share a corpus, since every character of every
  *    in-domain word is a vocabulary piece by construction).
  */
case class UnigramViterbi(child: Expression, pieces: Seq[(String, Double)],
    maxPieceLen: Int, maxWordLen: Int, countTokens: Boolean)
  extends UnaryExpression {

  require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
    s"need 1 <= maxPieceLen <= maxWordLen: $maxPieceLen, $maxWordLen")
  override def dataType: DataType =
    if (countTokens) LongType else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String =
    if (countTokens) "graft_unigram_token_count" else "graft_unigram_pieces"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, s) }
    m
  }

  /** Viterbi path of `w` (in order), or null when out of domain. */
  private[graft] def segmentWord(w: String): Array[String] = {
    val n = w.length
    if (n == 0 || n > maxWordLen) return null
    val dp = new Array[Double](n + 1)
    val bl = new Array[Int](n + 1) // backpointer piece length; -1 = unreachable
    java.util.Arrays.fill(bl, -1)
    bl(0) = 0
    var j = 1
    while (j <= n) {
      var bestS = 0.0
      var bestL = -1
      val lMax = if (maxPieceLen < j) maxPieceLen else j
      var l = 1
      while (l <= lMax) {
        if (bl(j - l) >= 0) {
          val sc = table.get(w.substring(j - l, j))
          if (sc != null) {
            val cand = dp(j - l) + sc.doubleValue()
            // strict > keeps the FIRST (smallest-l) candidate on ties —
            // the SQL mirror's (s DESC, l ASC) row_number order
            if (bestL < 0 || cand > bestS) { bestS = cand; bestL = l }
          }
        }
        l += 1
      }
      if (bestL > 0) { dp(j) = bestS; bl(j) = bestL }
      j += 1
    }
    if (bl(n) < 0) return null
    var k = 0
    var pos = n
    while (pos > 0) { k += 1; pos -= bl(pos) }
    val out = new Array[String](k)
    pos = n
    var i = k - 1
    while (pos > 0) { out(i) = w.substring(pos - bl(pos), pos); pos -= bl(pos); i -= 1 }
    out
  }

  /** Corpus-text token count: words split on whitespace after a
    * space-only trim + lowercase (the `split(trim(text), "\\s+")` /
    * `lower` tree every oracle shares); out-of-domain words count 0. */
  private[graft] def countText(text: String): Long = {
    var a = 0
    var b = text.length
    while (a < b && text.charAt(a) == ' ') a += 1
    while (b > a && text.charAt(b - 1) == ' ') b -= 1
    if (a >= b) return 0L
    val words = text.substring(a, b)
      .toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var total = 0L
    var i = 0
    while (i < words.length) {
      val seg = segmentWord(words(i))
      if (seg != null) total += seg.length
      i += 1
    }
    total
  }

  def compute(input: UTF8String): Any =
    if (countTokens) countText(input.toString)
    else {
      val seg = segmentWord(input.toString)
      if (seg == null) null
      else new GenericArrayData(seg.map(UTF8String.fromString(_): Any))
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("unigramViterbi", this,
      classOf[UnigramViterbi].getName)
    if (countTokens)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = ((java.lang.Long) $ref.compute($c)).longValue();")
    else {
      val tmp = ctx.freshName("seg")
      nullSafeCodeGen(ctx, ev, c =>
        s"""Object $tmp = $ref.compute($c);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
           |""".stripMargin)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {
  import org.apache.spark.sql.GraftSqlShim

  /** Viterbi pieces of a (lowercased) word column — the E-step body. */
  def pieces(word: Column, vocab: Seq[(String, Double)], maxPieceLen: Int,
             maxWordLen: Int): Column =
    GraftSqlShim.column(UnigramViterbi(GraftSqlShim.expression(word), vocab,
      maxPieceLen, maxWordLen, countTokens = false))

  /** Per-text token count under the trained vocabulary. */
  def tokenCount(text: Column, vocab: Seq[(String, Double)], maxPieceLen: Int,
                 maxWordLen: Int): Column =
    GraftSqlShim.column(UnigramViterbi(GraftSqlShim.expression(text), vocab,
      maxPieceLen, maxWordLen, countTokens = true))
}
