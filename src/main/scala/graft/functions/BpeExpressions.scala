package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled BPE encoder over the mark-delimited symbol form of
  * [[graft.ops.TextOps.bpeSymbolString]], as ONE reference-object
  * expression holding the whole merge-rank table — the
  * [[GramAnchors]] / PortableLn fusion discipline.
  *
  * Why this exists: `TextOps.bpeApplyMerges` folds one literal
  * `replace` node per merge. At the pinned 8-merge catalog table that
  * is fine (and it stays — it is the differential-oracle twin, since
  * every SQL engine's `replace` shares its semantics), but a
  * production tokenizer carries ~32k merges: the fold would be a
  * 32k-deep expression tree (the Janino/codegen-blowup class this
  * repo hit with SignLshBuckets, GramAnchors and PortableLn) AND 32k
  * full string passes per document. This node applies the same table
  * in O(applied-merges × word-length) per DISTINCT word, with a
  * per-thread LRU word cache exploiting Zipf repetition.
  *
  * Bit-compatibility contract (the oracles depend on it): output is
  * IDENTICAL to the sequential replace chain
  * `merges.foldLeft(sym)((s,(l,r)) => replace(s, ␁l␁r, ␁lr))` for ANY
  * merge table — not just learned ones. That chain's exact semantics,
  * which this node reproduces:
  *
  *   - merges apply in TABLE ORDER, each as one full left-to-right
  *     non-overlapping pass (`replace` resumes scanning after the
  *     replacement, so a merge's own output is never its left operand
  *     within the same pass, while the FOLLOWING pair stays eligible);
  *   - a pattern `␁l␁r` matches where `l` is a COMPLETE current symbol
  *     (the mark after `l` pins its end) but `r` only needs to be a
  *     PREFIX of the next symbol — the replacement drops that symbol's
  *     mark, so the merge glues l with the ENTIRE next symbol
  *     ("␁a␁bc" under merge (a,b) → "␁abc"). Learned tables rarely
  *     exercise this corner (learning counts exact-symbol pairs), but
  *     the chain has it, so the compiled node must too;
  *   - matches never cross whitespace (separators carry no mark), so
  *     words encode independently — which is what makes the word
  *     cache sound;
  *   - a lone trailing mark (malformed input) matches no pattern and
  *     passes through verbatim.
  *
  * Sequential-pass application is implemented as a rank-cursor jump:
  * find the LOWEST-rank rule above the cursor with a live match
  * (rules indexed by left symbol, buckets rank-sorted), run that
  * rule's full pass, advance the cursor. Skipped ranks are exactly
  * the no-match passes of the naive chain, so outputs are identical
  * while the cost tracks applied merges, not table size.
  */
case class BpeEncodeMerges(child: Expression, merges: Seq[(String, String)],
    countTokens: Boolean)
  extends UnaryExpression {

  require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "merge operands must be non-empty")
  require(merges.forall { case (l, r) =>
      !(l + r).exists(c => c == BpeEncodeMerges.Mark || Character.isWhitespace(c)) },
    "merge operands must not contain the mark or whitespace")

  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = if (countTokens) LongType else StringType
  override def nullable: Boolean = child.nullable

  /** (rank asc) rule buckets keyed by left symbol; rank is the 1-based
    * table position. Rebuilt per deserialized instance. */
  @transient private lazy val byLeft: java.util.HashMap[String, Array[(Int, String)]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[(Int, String)]]()
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.computeIfAbsent(l, _ => scala.collection.mutable.ArrayBuffer.empty) += ((i + 1, r))
    }
    val out = new java.util.HashMap[String, Array[(Int, String)]](m.size())
    m.forEach((k, v) => out.put(k, v.sortBy(_._1).toArray))
    out
  }

  @transient private lazy val ruleByRank: Array[(String, String)] = merges.toArray

  /** Per-thread LRU word→encoding cache (the expression object is
    * shared across a JVM's tasks through the codegen references
    * array, so the cache must not be contended or shared). */
  @transient private lazy val wordCache: ThreadLocal[java.util.LinkedHashMap[String, String]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, String](1024, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, String]): Boolean =
          size() > 32768
      })

  /** One word (its raw `␁c␁c…` form) → its encoded form. */
  private def encodeWord(raw: String): String = {
    val cache = wordCache.get()
    val hit = cache.get(raw)
    if (hit != null) return hit

    // initial symbols: one per codepoint
    var syms = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < raw.length) { // raw = (Mark cp)+, validated by caller
        val cp = raw.codePointAt(i + 1)
        val w = Character.charCount(cp)
        b += raw.substring(i + 1, i + 1 + w)
        i += 1 + w
      }
      b
    }
    var cursor = 0
    var done = syms.length < 2
    while (!done) {
      // lowest-rank rule above the cursor with a live match
      var best = Int.MaxValue
      var k = 0
      while (k < syms.length - 1) {
        val rules = byLeft.get(syms(k))
        if (rules != null) {
          val next = syms(k + 1)
          var t = 0
          while (t < rules.length) {
            val rk = rules(t)._1
            if (rk >= best) t = rules.length // bucket rank-sorted: no improvement left
            else if (rk > cursor && next.startsWith(rules(t)._2)) {
              best = rk; t = rules.length
            } else t += 1
          }
        }
        k += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // full left-to-right non-overlapping pass for rule `best`
        val (l, r) = ruleByRank(best - 1)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var k2 = 0
        while (k2 < syms.length) {
          if (k2 + 1 < syms.length && syms(k2) == l && syms(k2 + 1).startsWith(r)) {
            out += syms(k2) + syms(k2 + 1) // prefix-glue: entire next symbol
            k2 += 2
          } else { out += syms(k2); k2 += 1 }
        }
        syms = out
        cursor = best
        if (syms.length < 2) done = true
      }
    }
    val sb = new java.lang.StringBuilder(raw.length)
    syms.foreach { s => sb.append(BpeEncodeMerges.Mark).append(s) }
    val enc = sb.toString
    cache.put(raw, enc)
    enc
  }

  /** Whole-string encode: separators verbatim, words via [[encodeWord]]. */
  def encode(sym: UTF8String): String = {
    val s = sym.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != BpeEncodeMerges.Mark) { out.append(c); i += 1 }
      else if (i + 1 >= n) { out.append(c); i += 1 } // lone trailing mark
      else {
        var j = i
        while (j < n && s.charAt(j) == BpeEncodeMerges.Mark && j + 1 < n) {
          j += 1 + Character.charCount(s.codePointAt(j + 1))
        }
        // [i, j) is a maximal well-formed word; a mark at j with no
        // following char is handled by the outer loop's verbatim arm
        out.append(encodeWord(s.substring(i, j)))
        i = j
      }
    }
    out.toString
  }

  def compute(sym: UTF8String): Any = {
    val enc = encode(sym)
    if (countTokens) {
      var n = 0L
      var i = 0
      while (i < enc.length) { if (enc.charAt(i) == BpeEncodeMerges.Mark) n += 1; i += 1 }
      n
    } else UTF8String.fromString(enc)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncodeMerges].getName)
    val cast = if (countTokens) "(java.lang.Long)" else "(org.apache.spark.unsafe.types.UTF8String)"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ($cast $ref.compute($c))" +
      (if (countTokens) ".longValue();" else ";"))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeMerges =
    copy(child = newChild)
}

object BpeEncodeMerges {
  final val Mark = '\u0001'

  /** Column API over a symbol-form column (see
    * [[graft.ops.TextOps.bpeSymbolString]]). */
  def encode(sym: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(BpeEncodeMerges(GraftSqlShim.expression(sym), merges, countTokens = false))
  }

  /** Token count (= surviving symbol count) under the merge table. */
  def tokenCount(sym: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(BpeEncodeMerges(GraftSqlShim.expression(sym), merges, countTokens = true))
  }
}
