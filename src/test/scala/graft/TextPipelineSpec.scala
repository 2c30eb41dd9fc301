package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling, TextOps}

/** Unit semantics for the round-7 pipeline ops: chunking, corpus-wide
  * keep-first line dedup, budget selection, BPE induction. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs: offsets, overlap, short tail, empty doc") {
    val docs = Seq(
      (1L, "abcdefghij"), // 10 chars: starts 0,4,8 at stride 4
      (2L, "abc"),        // one short chunk
      (3L, "")            // no chunks
    ).toDF("id", "text")
    val out = TextOps.chunkDocs(docs, "id", "text", chunkChars = 6, strideChars = 4)
      .select("id", "chunk_id", "chunk_start", "chunk_text", "chunk_chars")
      .as[(Long, Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, "abcdef", 6L),
      (1L, 1L, 4L, "efghij", 6L),  // overlap of 2 chars with chunk 0
      (1L, 2L, 8L, "ij", 2L),      // short tail
      (2L, 0L, 0L, "abc", 3L)))
  }

  test("chunkDocs plan is a single generator projection — no shuffle") {
    val docs = Seq((1L, "abcdef")).toDF("id", "text")
    val chunks = TextOps.chunkDocs(docs, "id", "text", 4, 2)
    val exchanges = chunks.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "chunking must be row-local")
  }

  test("dedupLinesGlobal keeps first occurrence, blanks, and line order") {
    val docs = Seq(
      (1L, "alpha\nbeta\n\nalpha"),   // own later dup "alpha" dropped; blank kept
      (2L, "beta\ngamma\nbeta"),      // "beta" seen in doc 1 → both dropped
      (3L, "delta")                   // untouched
    ).toDF("id", "text")
    val out = Dedup.dedupLinesGlobal(docs, "id", "text")
      .select("id", "clean_text", "n_lines", "n_dropped")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "alpha\nbeta\n", 4L, 1L),   // trailing blank line survives
      (2L, "gamma", 3L, 2L),
      (3L, "delta", 1L, 0L)))
  }

  test("dedupLinesGlobal above the broadcast id limit falls back to a shuffle join") {
    val docs = Seq((1L, "x\ny"), (2L, "x"), (3L, "y\nx")).toDF("id", "text")
    // auto-broadcast off + AQE off: on a 3-row fixture the planner
    // would otherwise broadcast BOTH modes on size alone — at corpus
    // scale the hint is the only thing forcing a broadcast, which is
    // exactly the cliff the size gate removes
    def modes(run: => org.apache.spark.sql.DataFrame): (Boolean, Seq[(Long, String)]) = {
      val df = run
      val plan = df.queryExecution.executedPlan
      val hasBroadcast = plan.toString.contains("BroadcastHashJoin") ||
        plan.toString.contains("BroadcastExchange")
      (hasBroadcast, df.select("id", "clean_text").as[(Long, String)].collect().toSeq.sortBy(_._1))
    }
    val (bcast, rowsB, shuffled, rowsS) =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val (b, rb) = modes(Dedup.dedupLinesGlobal(docs, "id", "text"))
        spark.conf.set(Dedup.MaxBroadcastIdsKey, "0")
        val (sh, rs) = modes(Dedup.dedupLinesGlobal(docs, "id", "text"))
        (b, rb, sh, rs)
      } finally {
        spark.conf.unset(Dedup.MaxBroadcastIdsKey)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    assert(bcast, "below the limit the drop-set join should broadcast")
    assert(!shuffled, "above the limit the forced broadcast hint must be gone")
    assert(rowsB == rowsS, "join mode must not change results")
    assert(rowsB == Seq((1L, "x\ny"), (2L, ""), (3L, "")))
  }

  test("removeBoilerplateLines: drops ≥minDocs lines, keeps order; gate falls back to shuffle") {
    val docs = Seq(
      (1L, "NAV BAR\nunique alpha\n\nFOOTER\nunique beta"),
      (2L, "NAV BAR\nonly in two\nFOOTER"),
      (3L, "totally original\nNAV BAR")
    ).toDF("id", "text")
    val expected = Seq(
      (1L, "unique alpha\nunique beta", 2L),
      (2L, "only in two", 1L),
      (3L, "totally original", 1L))
    def modes(run: => org.apache.spark.sql.DataFrame): (Boolean, Seq[(Long, String, Long)]) = {
      val df = run
      val plan = df.queryExecution.executedPlan.toString
      val hasBroadcast = plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastExchange")
      (hasBroadcast,
        df.select("id", "clean_text", "n_kept").as[(Long, String, Long)]
          .collect().toSeq.sortBy(_._1))
    }
    val (bcast, rowsB, shuffled, rowsS) =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val (b, rb) = modes(TextOps.removeBoilerplateLines(docs, "id", "text"))
        spark.conf.set(Dedup.MaxBroadcastIdsKey, "0")
        val (sh, rs) = modes(TextOps.removeBoilerplateLines(docs, "id", "text"))
        (b, rb, sh, rs)
      } finally {
        spark.conf.unset(Dedup.MaxBroadcastIdsKey)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    assert(bcast, "below the limit the drop-position join should broadcast")
    assert(!shuffled, "above the limit the forced broadcast hint must be gone")
    assert(rowsB == rowsS, "join mode must not change results")
    assert(rowsB == expected)
  }

  test("budgetSelect: greedy prefix per group, overflow row dropped") {
    val rows = Seq(
      // group g1: order by score desc → ids 1(5),2(4),3(3); budget 9 keeps 1,2
      (1L, "g1", 5L, 5L), (2L, "g1", 4L, 4L), (3L, "g1", 3L, 3L),
      // group g2: single row over budget → nothing kept
      (4L, "g2", 9L, 20L),
      // group g3: exact fit
      (5L, "g3", 2L, 9L)
    ).toDF("id", "grp", "score", "w")
    val kept = Sampling.budgetSelect(rows, "id", "grp", "score", "w", budget = 9L)
      .select("id", "cum_weight").as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 5L, 2L -> 9L, 5L -> 9L))
    // contract enforcement: fractional weights would truncate silently
    val frac = rows.withColumn("w", col("w").cast("double"))
    val e = intercept[IllegalArgumentException] {
      Sampling.budgetSelect(frac, "id", "grp", "score", "w", budget = 9L)
    }
    assert(e.getMessage.contains("integral"))
    // ... and a negative weight breaks prefix monotonicity → job fails
    // at the first offender instead of re-admitting post-overflow rows
    val neg = Seq((1L, "g1", 5L, 5L), (2L, "g1", 4L, -1L)).toDF("id", "grp", "score", "w")
    val err = intercept[Exception] {
      Sampling.budgetSelect(neg, "id", "grp", "score", "w", budget = 9L).collect()
    }
    assert(err.getMessage != null)
  }

  test("bpeTopPairs counts frequency-weighted adjacent pairs, overlaps included") {
    val docs = Seq((1L, "lll lo"), (2L, "lo lo")).toDF("id", "text")
    // words: lll ×1 (pairs ll, ll), lo ×3 (pair lo)
    val out = TextOps.bpeTopPairs(docs, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("lo", 3L), ("ll", 2L)))
  }

  test("bpeLearn: merges apply left-to-right non-overlapping and feed later rounds") {
    // corpus: "aaab" ×3, "ab" ×2.
    // round 1 pairs: (a,a)=6 [two per aaab], (a,b)=5 → merge aa.
    // round 2 symbols: "aa a b" ×3, "a b" ×2 → (a,b)=5, (aa,a)=3 → merge ab.
    // round 3: "aa ab" ×3, "ab" ×2 → (aa,ab)=3 → merge aaab.
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("id", "text")
    val merges = TextOps.bpeLearn(docs, "text", rounds = 3)
      .select("merge_rank", "merged", "score")
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(merges == Seq((1, "aa", 6L), (2, "ab", 5L), (3, "aaab", 3L)))
  }

  test("bpeApplyMerges: greedy left-to-right, chained merges, word boundaries") {
    import graft.ops.TextOps._
    val merges = Seq("e" -> "r", "m" -> "er")
    val docs = Seq(
      (1L, "merer"),   // m e r e r → m er er → mer er = 2 tokens
      (2L, "e r"),     // separate words: no cross-word merge = 2 tokens
      (3L, "rrr er"),  // no e→r site in "rrr"; "er" merges = 3 + 1
      (4L, "")         // empty → 0
    ).toDF("id", "text")
    val out = docs.select(col("id"),
        bpeTokenCount(col("text"), merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 4L, 4L -> 0L))
    // the encoded form itself: markers delimit final symbols
    val enc = docs.where(col("id") === 1)
      .select(bpeApplyMerges(bpeSymbolString(col("text")), merges))
      .as[String].head()
    assert(enc == s"${BpeMark}mer${BpeMark}er")
  }

  test("normalizeText: NFC composition, control strip, whitespace squeeze") {
    import graft.ops.TextOps
    val rows = Seq(
      (1L, "café time"),            // decomposed é → composed, 1 char
      (2L, "ab\r\nline2\rline3"),   // BEL stripped, CR/CRLF → LF
      (3L, "  a \t b\t\tc  "),            // squeeze + trim
      (4L, "x \n y"),                     // spaces around newline stripped
      (5L, "café")                   // already composed: fixpoint
    ).toDF("id", "text")
    val out = rows.select(col("id"), TextOps.normalizeText(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "café time" && out(1L).length == 9)
    assert(out(2L) == "ab\nline2\nline3")
    assert(out(3L) == "a b c")
    assert(out(4L) == "x\ny")
    assert(out(5L) == "café")
    // idempotent: normalize(normalize(x)) == normalize(x)
    val twice = rows.select(
        TextOps.normalizeText(TextOps.normalizeText(col("text"))).as("t"))
      .as[String].collect().toSeq
    assert(twice == rows.select(TextOps.normalizeText(col("text")))
      .as[String].collect().toSeq)
  }

  test("gopherQualityFlags: each rule binds on a targeted fixture") {
    import graft.ops.TextOps
    val good = (("the data and systems work well with care " * 4).trim + " of that")
    val docs = Seq(
      (1L, good),                                    // passes all (word count via minWords=5)
      (2L, "the of " + ("x " * 60).trim),            // mean word len 1.26 < 3 → fail
      (3L, ("123 456 " * 30).trim + " the of"),      // alpha frac < 0.8 → fail
      (4L, ("data systems work well " * 15).trim),   // no stopwords → fail
      (5L, "the of " + ("### " * 30).trim)           // symbol ratio > 0.1 AND alpha fail
    ).toDF("id", "text")
    val out = TextOps.gopherQualityFlags(docs, "id", "text", minWords = 5)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false))
    val row = TextOps.gopherQualityFlags(docs, "id", "text", minWords = 5)
      .where(col("id") === 5)
      .select("symbol_ratio", "stop_hits").as[(Double, Long)].head()
    assert(row._1 > 0.1 && row._2 == 2L)
  }

  test("gopherQualityFlags: App-A line/paragraph rules bind on targeted fixtures") {
    import graft.ops.TextOps
    val docs = Seq(
      // every line a bullet, lines distinct → ONLY the bullet rule fires
      (6L, (1 to 10).map(i => s"• the data and work$i").mkString("\n")),
      // every line ends with single-char ellipsis (won't trip the
      // '...'-based symbol ratio) → ONLY the ellipsis rule fires
      (7L, (1 to 10).map(i => s"the data and work$i…").mkString("\n")),
      // a paragraph repeated 3× → both duplicate-paragraph fractions
      // (and, necessarily, the line fractions) fire
      (8L, Seq.fill(3)("the data and work here today").mkString("\n\n")
        + "\n\nmore of this content now here1"),
      // structured but clean: distinct lines/paras, no bullets/ellipses
      (9L, "the data and work here\n\nmore of this content now here1")
    ).toDF("id", "text")
    val rows = TextOps.gopherQualityFlags(docs, "id", "text", minWords = 5)
      .select("id", "bullet_frac", "ellipsis_frac", "dup_para_frac",
        "dup_para_char_frac", "dup_line_frac", "dup_line_char_frac", "keep")
      .as[(Long, Double, Double, Double, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val d6 = rows(6L)
    assert(d6._2 == 1.0 && d6._3 == 0.0 && d6._4 == 0.0 && !d6._8,
      s"bullet doc: $d6")
    val d7 = rows(7L)
    assert(d7._3 == 1.0 && d7._2 == 0.0 && !d7._8, s"ellipsis doc: $d7")
    val d8 = rows(8L)
    assert(d8._4 == 0.5 && d8._5 > 0.2 && d8._6 == 0.5 && !d8._8,
      s"dup-para doc: $d8")
    val d9 = rows(9L)
    assert(d9._2 == 0.0 && d9._3 == 0.0 && d9._4 == 0.0 && d9._6 == 0.0 && d9._8,
      s"clean structured doc must keep: $d9")
  }

  test("bigramSurprisal matches a hand-computed add-one bigram model") {
    import graft.ops.TextOps
    // corpus: doc1 "a b a b", doc2 "a b" → bc(a,b)=3, bc(b,a)=1,
    // uc(a)=3, uc(b)=3, V=2 → p(b|a)=4/5, p(a|b)=2/5
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("id", "text")
    val out = TextOps.bigramSurprisal(docs, "id", "text")
      .select("id", "n_bigrams", "surprisal")
      .as[(Long, Long, Double)].collect()
      .map { case (i, n, s) => i -> ((n, s)) }.toMap
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    val exp1 = -(math.log(0.8) + math.log(0.4) + math.log(0.8)) / 3.0
    val exp2 = -math.log(0.8)
    // the portable series is within ~5e-12 relative of libm
    assert(math.abs(out(1L)._2 - exp1) < 1e-9, s"doc1 ${out(1L)._2} vs $exp1")
    assert(math.abs(out(2L)._2 - exp2) < 1e-9, s"doc2 ${out(2L)._2} vs $exp2")
  }

  test("bpeLearn stops early when no pairs remain") {
    val docs = Seq((1L, "a b a")).toDF("id", "text")
    val merges = TextOps.bpeLearn(docs, "text", rounds = 5).collect()
    assert(merges.isEmpty) // all words are single symbols
  }

  test("removeRepeatedLines: keep-first order, blanks dropped, counts") {
    val docs = Seq(
      // nav/nav/body/nav/body2 + blank → keep nav, body, body2 in order
      (1L, "nav\nnav\nbody\n\nnav\nbody2"),
      (2L, "only line"),                  // nothing repeated, no blank
      (3L, "\n \n"),                      // all blank → empty rewrite
      (4L, "x\nx\nx\nx")                  // one survivor
    ).toDF("id", "text")
    val out = TextOps.removeRepeatedLines(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("nav\nbody\nbody2", 3L, 2L)))
    assert(out(2L) == (("only line", 1L, 0L)))
    assert(out(3L) == (("", 0L, 0L)))
    assert(out(4L) == (("x", 1L, 3L)))
    // the zero-shuffle claim: no Exchange anywhere in the plan
    val plan = TextOps.removeRepeatedLines(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("htmlToText: block elision, break insertion, single-decode entities") {
    def ext(s: String): String = {
      val r = Seq(Tuple1(s)).toDF("h")
        .select(TextOps.htmlToText(col("h"))).head()
      if (r.isNullAt(0)) null else r.getString(0)
    }
    // script/style bodies (with bare < inside) vanish BEFORE tag strip;
    // </p> and </title> become newlines
    assert(ext("<html><head><title>T</title><style>p{a:b}</style></head>" +
      "<body><p>a</p><p>b</p><script>if(1<2){x=1;}</script></body></html>")
      == "T\na\nb")
    // comments wrapping markup vanish entirely; <br> breaks; nbsp decodes
    assert(ext("x<!-- hidden <b>secret</b> --><br>NEXT&nbsp;LINE")
      == "x\nNEXT LINE")
    // entity decode runs AFTER tag strip (so &lt;tag&gt; is literal
    // text) and &amp; decodes LAST (single-decode: &amp;lt; -> &lt;)
    assert(ext("&lt;tag&gt; &amp; &quot;q&quot; &#39;&apos; &amp;lt;")
      == "<tag> & \"q\" '' &lt;")
    // HTML5 omitted closers are valid and ubiquitous: open block tags
    // break too, so adjacent cells/paragraphs never fuse into one word
    assert(ext("<p>one<p>two") == "one\ntwo")
    assert(ext("<tr><td>a</td><td>b</td></tr>") == "a\nb")
    // plain text is whitespace-normalized only; null stays null
    assert(ext("plain  words\r\nhere") == "plain words\nhere")
    assert(ext(null) == null)
    // unclosed script degrades gracefully: the generic tag strip still
    // removes the tag itself (body text survives — not a browser)
    assert(ext("a<script>rest") == "arest")
    // zero-shuffle claim
    val plan = Seq(Tuple1("x")).toDF("h")
      .select(TextOps.htmlToText(col("h")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("chunkSentences: greedy boundaries, order kept, oversize rides alone") {
    val docs = Seq(
      // sentences of 8/9/7 chars; max 20 with ' ' joins:
      // "one two." (8) + "three f!" (8+1+8=17) fits; "four g?" starts new
      (1L, "one two. three f! four g?"),
      // a lone sentence longer than max rides as its own oversize chunk
      (2L, "this sentence is far too long to fit. ok."),
      // no terminal punctuation → one sentence, one chunk
      (3L, "just words no marks")
    ).toDF("id", "text")
    val out = TextOps.chunkSentences(docs, "id", "text", maxChars = 20)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    assert(out((1L, 0)) == (("one two. three f!", 17L)))
    assert(out((1L, 1)) == (("four g?", 7L)))
    assert(out((2L, 0)) == (("this sentence is far too long to fit.", 37L)))
    assert(out((2L, 1)) == (("ok.", 3L)))
    assert(out((3L, 0)) == (("just words no marks", 19L)))
    // sentences never split; reading order preserved within chunks
    assert(out.keys.toSeq.sorted == Seq((1L, 0), (1L, 1), (2L, 0), (2L, 1), (3L, 0)))
    // zero-shuffle claim: generator projection only
    val plan = TextOps.chunkSentences(docs, "id", "text", 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
