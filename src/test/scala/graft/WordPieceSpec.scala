package graft

import org.apache.spark.sql.functions._

import graft.ops.WordPiece
import graft.functions.WordPieceEncode

/** [[graft.ops.WordPiece]] / [[graft.functions.WordPieceEncode]] —
  * greedy longest-match-first two-role subword segmentation. Vocab
  * pieces are PLAIN substrings (the role is structural); `##` appears
  * only in the rendered token string. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val init = Seq("un", "hug", "hugs", "ab", "abc", "a")
  private val cont = Seq("aff", "able", "s", "c", "d")

  private def enc(text: String, mode: String, maxWordLen: Int = 12): Any = {
    val df = Seq(text).toDF("t")
    val c = mode match {
      case "tokens" => WordPieceEncode.tokens(col("t"), init, cont, maxWordLen)
      case "count" => WordPieceEncode.tokenCount(col("t"), init, cont, maxWordLen)
      case _ => WordPieceEncode.unkCount(col("t"), init, cont, maxWordLen)
    }
    df.select(c).head().get(0)
  }

  test("hand ladder: classic WordPiece segmentations, longest-first, [UNK] collapse, length cap") {
    // the textbook example
    assert(enc("unaffable", "tokens") == "un ##aff ##able")
    assert(enc("unaffable", "count") == 3L)
    assert(enc("unaffable", "unk") == 0L)
    // longest-match-first at position 0: "abc" beats "ab" beats "a"
    assert(enc("abcd", "tokens") == "abc ##d")
    // greedy is NOT optimal lookahead: "hugs" exists whole, taken whole
    assert(enc("hugs", "tokens") == "hugs")
    // mid-word failure discards all progress — whole word is [UNK]
    assert(enc("abx", "tokens") == "[UNK]")
    assert(enc("abx", "count") == 1L)
    assert(enc("abx", "unk") == 1L)
    // multi-word text: independent words, case-folded, whitespace-split
    assert(enc("  Unaffable   HUGS abx ", "tokens") ==
      "un ##aff ##able hugs [UNK]")
    assert(enc("Unaffable hugs abx", "count") == 5L)
    assert(enc("Unaffable hugs abx", "unk") == 1L)
    // the length cap: a word over maxWordLen is [UNK] without scanning
    assert(enc("unaffable", "tokens", maxWordLen = 8) == "[UNK]")
    // empty / whitespace-only text contributes nothing
    assert(enc("", "count") == 0L)
    assert(enc("   ", "count") == 0L)
    // null passes through
    val n = Seq(Option.empty[String]).toDF("t")
      .select(WordPieceEncode.tokenCount(col("t"), init, cont, 12)).head()
    assert(n.isNullAt(0))
  }

  test("learn: two-role substring counts hand-verified; tokenStats end-to-end") {
    // corpus "abc abc ab": words abc(2), ab(1); substrings (maxPieceLen
    // 2): init a=3, ab=3; cont b=3, bc=2, c=2 — all pass minCount 2
    val corpus = Seq("abc abc", "ab").toDF("text")
    val v = WordPiece.learn(corpus, "text", maxPieceLen = 2,
      maxWordLen = 12, minCount = 2)
    assert(v.init.toSet == Set(("a", 3L), ("ab", 3L)), s"init ${v.init}")
    assert(v.cont.toSet == Set(("b", 3L), ("bc", 2L), ("c", 2L)),
      s"cont ${v.cont}")
    // minCount filters: at 3 only a/ab/b survive
    val v3 = WordPiece.learn(corpus, "text", maxPieceLen = 2,
      maxWordLen = 12, minCount = 3)
    assert(v3.init.map(_._1) == Seq("a", "ab") && v3.cont.map(_._1) == Seq("b"))
    // segmentation under the learned vocab: "abc"→ab ##c (2), "ab"→1,
    // "zz"→[UNK]
    val got = WordPiece.tokenStats(
        Seq((1L, "abc ab zz"), (2L, "abc abc")).toDF("id", "text"),
        "id", "text", v)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 4L, 1L), (2L, 4L, 0L)), s"got $got")
  }

  test("partition independence and Zipf-cache coherence on fixture text") {
    val docs = graft.ops.Tables.table(spark, sf, "documents")
    val v = WordPiece.learn(docs.select(col("text")), "text",
      maxPieceLen = 4, maxWordLen = 12, minCount = 2)
    assert(v.init.nonEmpty && v.cont.nonEmpty)
    val part = graft.ops.Tables.table(spark, sf, "part")
    val a = WordPiece.tokenStats(part, "p_partkey", "p_name", v)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = WordPiece.tokenStats(part.repartition(7), "p_partkey", "p_name", v)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // the cross-domain [UNK] path is LIVE on the fixture (part names
    // carry letters the documents vocabulary never saw)
    assert(a.exists(_._3 > 0L), "fixture must exercise [UNK]")
  }

  test("learnScored: hand-computed two-round likelihood ladder, counts re-derived after each merge; deterministic tie-break") {
    // corpus: "abc"×3, "bc"×1 over two-role symbols
    //   abc → a ##b ##c (×3), bc → b ##c
    // round 1 counts: a=3 ##b=3 ##c=4 b=1;
    //   pairs (a,##b)=3 → 3/(3·3)=.333  (##b,##c)=3 → 3/(3·4)=.25
    //         (b,##c)=1 → 1/(1·4)=.25   → winner (a,##b) = "ab"
    // round 2 (counts RE-DERIVED after the merge): ab=3 ##c=4 b=1;
    //   pairs (ab,##c)=3 → 3/(3·4)  (b,##c)=1 → 1/(1·4) — scores are
    //   the EXACT same double (ln3−ln3 and ln1−ln1 both cancel to 0),
    //   so the (l, r) binary tie-break decides: "ab" < "b" → winner
    //   (ab,##c) = "abc", proving the tie-break order is live
    val docs = Seq("abc abc abc", "bc").toDF("text")
    val m = WordPiece.learnScored(docs, "text", rounds = 2)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq
    assert(m == Seq(
      (1, "a", "##b", "ab", 3L),
      (2, "ab", "##c", "abc", 3L)), s"got $m")
    // exhaustion stops early: 10 requested rounds, only 3 merges exist
    // ("abc" then "b"+"##c"→"bc"; the single-symbol words end it)
    val all = WordPiece.learnScored(docs, "text", rounds = 10).collect()
    assert(all.length == 3, s"expected 3 merges, got ${all.length}")
    assert(all(2).getString(3) == "bc")
  }
}
