package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled WordPiece encoder — the third production tokenizer family
  * beside BPE ([[BpeEncodeMerges]]) and unigram-LM
  * ([[UnigramViterbi]]): greedy longest-match-first subword
  * segmentation with `##` continuation pieces (the BERT tokenizer's
  * algorithm, public from the original implementation):
  *
  *   - the text lowercases and splits on whitespace; each word
  *     encodes independently (what makes the word cache sound);
  *   - within a word, from position p take the LONGEST piece that is
  *     in the vocabulary under the position's role — word-INITIAL
  *     pieces at p = 0, CONTINUATION (`##`) pieces after — then
  *     advance past it;
  *   - if NO piece matches at some position, or the word exceeds
  *     `maxWordLen` (the reference tokenizer's
  *     max_input_chars_per_word posture), the WHOLE word becomes one
  *     [UNK] token — partial progress is discarded;
  *   - the empty word contributes nothing.
  *
  * One reference-object node (the [[BpeEncodeMerges]] discipline):
  * the whole two-role vocabulary rides the codegen references array,
  * the scan stays inside whole-stage codegen, and a per-thread LRU
  * word cache exploits Zipf repetition. Cost is
  * O(word-length · max-piece-length) per DISTINCT word.
  *
  * Bit-compatibility contract (q233's oracle replays it): the greedy
  * scan is a deterministic function of (vocabulary, word) with no
  * floats anywhere, so the DuckDB unrolled per-step CTE chain —
  * longest equi-joined prefix per step, [UNK] collapse on failure —
  * reproduces every count exactly.
  *
  * `mode`: `"count"` = token count (LongType; an [UNK] word counts
  * 1), `"unk"` = [UNK]-word count (LongType), `"tokens"` = the
  * space-joined token string with `##` prefixes visible (StringType —
  * the spec-inspection form).
  */
case class WordPieceEncode(child: Expression, vocabInit: Seq[String],
    vocabCont: Seq[String], maxWordLen: Int, mode: String)
  extends UnaryExpression {

  require(Seq("count", "unk", "tokens").contains(mode), s"bad mode $mode")
  require(maxWordLen >= 1, s"maxWordLen must be >= 1, got $maxWordLen")
  require(vocabInit.forall(_.nonEmpty) && vocabCont.forall(_.nonEmpty),
    "vocabulary pieces must be non-empty")

  override def prettyName: String = "graft_wordpiece_encode"
  override def dataType: DataType =
    if (mode == "tokens") StringType else LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val initSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocabInit.size * 2)
    vocabInit.foreach(s.add); s
  }
  @transient private lazy val contSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocabCont.size * 2)
    vocabCont.foreach(s.add); s
  }
  @transient private lazy val maxInitLen: Int =
    if (vocabInit.isEmpty) 0 else vocabInit.map(_.length).max
  @transient private lazy val maxContLen: Int =
    if (vocabCont.isEmpty) 0 else vocabCont.map(_.length).max

  /** encoded word → (tokens string, piece count, isUnk). */
  @transient private lazy val wordCache: ThreadLocal[java.util.LinkedHashMap[String, (String, Long, Boolean)]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, (String, Long, Boolean)](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, (String, Long, Boolean)]): Boolean =
          size() > 32768
      })

  private def encodeWord(w: String): (String, Long, Boolean) = {
    val cache = wordCache.get()
    val hit = cache.get(w)
    if (hit != null) return hit
    val res =
      if (w.length > maxWordLen) ("[UNK]", 1L, true)
      else {
        val sb = new java.lang.StringBuilder(w.length + 8)
        var p = 0
        var n = 0L
        var bad = false
        while (p < w.length && !bad) {
          val cont = p > 0
          val cap = math.min(w.length - p, if (cont) maxContLen else maxInitLen)
          var l = cap
          var found = -1
          while (l >= 1 && found < 0) {
            val piece = w.substring(p, p + l)
            val inVocab =
              if (cont) contSet.contains(piece) else initSet.contains(piece)
            if (inVocab) found = l else l -= 1
          }
          if (found < 0) bad = true
          else {
            if (n > 0L) sb.append(' ')
            if (cont) sb.append("##")
            sb.append(w, p, p + found)
            n += 1L
            p += found
          }
        }
        if (bad) ("[UNK]", 1L, true) else (sb.toString, n, false)
      }
    cache.put(w, res)
    res
  }

  def compute(text: UTF8String): Any = {
    // Locale.ROOT, not the JVM default: the learn side lowercases with
    // Spark's lower() and the oracle with DuckDB's lower() — both
    // locale-independent — so a Turkish-locale JVM ('I' → 'ı') would
    // otherwise segment against a vocabulary that never saw the word.
    // (The ASCII-range mapping is identical across all three.)
    val words = text.toString.trim
      .toLowerCase(java.util.Locale.ROOT).split("\\s+")
    mode match {
      case "count" =>
        var n = 0L
        var i = 0
        while (i < words.length) {
          if (words(i).nonEmpty) n += encodeWord(words(i))._2
          i += 1
        }
        n
      case "unk" =>
        var n = 0L
        var i = 0
        while (i < words.length) {
          if (words(i).nonEmpty && encodeWord(words(i))._3) n += 1L
          i += 1
        }
        n
      case _ =>
        val sb = new java.lang.StringBuilder(text.numChars() + 16)
        var i = 0
        while (i < words.length) {
          if (words(i).nonEmpty) {
            if (sb.length() > 0) sb.append(' ')
            sb.append(encodeWord(words(i))._1)
          }
          i += 1
        }
        UTF8String.fromString(sb.toString)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wpEncode", this, classOf[WordPieceEncode].getName)
    val cast = if (mode == "tokens") "(org.apache.spark.unsafe.types.UTF8String)"
      else "(java.lang.Long)"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ($cast $ref.compute($c))" +
      (if (mode == "tokens") ";" else ".longValue();"))
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPieceEncode {
  private def mk(text: Column, init: Seq[String], cont: Seq[String],
                 maxWordLen: Int, mode: String): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(WordPieceEncode(GraftSqlShim.expression(text),
      init, cont, maxWordLen, mode))
  }

  /** Token count of `text` under the two-role vocabulary. */
  def tokenCount(text: Column, init: Seq[String], cont: Seq[String],
                 maxWordLen: Int): Column =
    mk(text, init, cont, maxWordLen, "count")

  /** [UNK]-word count of `text`. */
  def unkCount(text: Column, init: Seq[String], cont: Seq[String],
               maxWordLen: Int): Column =
    mk(text, init, cont, maxWordLen, "unk")

  /** The space-joined token string (`##` continuations visible). */
  def tokens(text: Column, init: Seq[String], cont: Seq[String],
             maxWordLen: Int): Column =
    mk(text, init, cont, maxWordLen, "tokens")
}
