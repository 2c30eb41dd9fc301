package graft

import org.apache.spark.sql.functions._

import graft.functions.{PortableSketches, UnigramViterbi}
import graft.ops.Unigram

/** [[graft.ops.Unigram]] — unigram-LM tokenizer training (Viterbi-EM)
  * and the compiled Viterbi segmentation expression. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def ln(v: Long): Double = PortableSketches.lnOfPosLong(v)

  test("learn: hand-computed 2-round ladder on {abab×2, ab×3}") {
    // seed candidates (len ≤ 2, overlaps, frequency-weighted):
    //   a=7, b=7, ab=7, ba=2 → vocab0 all four (vocabMulti=2 keeps
    //   ab, ba), total 23
    // EM round 1: Viterbi under ln(c/23): "ab"→[ab] (−1.19 beats
    //   a+b=−2.38), "abab"→[ab,ab] → counts ab=2·2+3=7, a=b=0→floor 1,
    //   ba=0→dropped → vocab1 = {a:1, b:1, ab:7}, total 9
    // EM round 2: same segmentations under ln(c/9) → identical counts
    val corpus = (Seq.fill(2)("abab") ++ Seq.fill(3)("ab")).toDF("text")
    val vocab = Unigram.learn(corpus, "text", maxPieceLen = 2,
      maxWordLen = 4, vocabMulti = 2, emRounds = 2)
    val got = vocab.pieces.map(p => p.piece -> (p.cnt, p.score)).toMap
    assert(got.keySet == Set("a", "b", "ab"), s"vocab: $got")
    assert(got("a")._1 == 1L && got("b")._1 == 1L && got("ab")._1 == 7L)
    assert(got("ab")._2 == ln(7) - ln(9), "scores must be portable-ln exact")
    assert(got("a")._2 == ln(1) - ln(9))
    // intermediate state check: after ONE round the floor/prune
    // already dropped ba and floored the chars
    val one = Unigram.learn(corpus, "text", maxPieceLen = 2,
      maxWordLen = 4, vocabMulti = 2, emRounds = 1)
    assert(one.pieces.map(p => p.piece -> p.cnt).toMap ==
      Map("a" -> 1L, "b" -> 1L, "ab" -> 7L))
    // determinism under corpus repartitioning
    val again = Unigram.learn(corpus.repartition(5), "text",
      maxPieceLen = 2, maxWordLen = 4, vocabMulti = 2, emRounds = 2)
    assert(again.pieces == vocab.pieces)
  }

  test("viterbi expression: argmax picks best path; ties go to the smallest piece length") {
    // s(aa) = exactly s(a)+s(a): the two segmentations of "aa" tie
    // bit-for-bit → the smallest-l backpointer must win → [a, a]
    val tied = Seq(("a", -1.0), ("aa", -2.0))
    val segT = Seq("aa").toDF("w")
      .select(UnigramViterbi.pieces(col("w"), tied, 2, 8).as("p"))
      .as[Seq[String]].head()
    assert(segT == Seq("a", "a"), s"tie must go to single chars: $segT")
    // clearly better multi-char path wins
    val better = Seq(("a", -3.0), ("aa", -2.0))
    val segB = Seq("aa").toDF("w")
      .select(UnigramViterbi.pieces(col("w"), better, 2, 8).as("p"))
      .as[Seq[String]].head()
    assert(segB == Seq("aa"))
  }

  test("tokenCount: whitespace split + lowercase; out-of-domain words count 0") {
    val vocab = Seq(("a", -1.0), ("b", -1.2), ("ab", -0.5))
    def cnt(text: String): Long =
      Seq(text).toDF("t")
        .select(UnigramViterbi.tokenCount(col("t"), vocab, 2, 4).as("n"))
        .as[Long].head()
    assert(cnt("ab abab") == 3L)        // [ab] + [ab, ab]
    assert(cnt("  AB\tabab  ") == 3L)   // trim + lower + any whitespace
    assert(cnt("abxab") == 0L)          // unknown char → unsegmentable
    assert(cnt("ababa") == 0L)          // longer than maxWordLen=4
    assert(cnt("ab ababa ab") == 2L)    // out-of-domain word skipped
    assert(cnt("") == 0L && cnt("   ") == 0L)
  }

  test("segmentation is partition-independent and matches the trained corpus domain") {
    val corpus = (Seq.fill(2)("abab") ++ Seq.fill(3)("ab")).toDF("text")
    val vocab = Unigram.learn(corpus, "text", maxPieceLen = 2,
      maxWordLen = 4, vocabMulti = 2, emRounds = 2)
    val docs = Seq((1L, "ab abab"), (2L, "abab abab ab"), (3L, ""))
      .toDF("doc_id", "text")
    val a = Unigram.tokenCounts(docs, "doc_id", "text", vocab)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Unigram.tokenCounts(docs.repartition(3), "doc_id", "text", vocab)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a == Seq((1L, 3L), (2L, 5L), (3L, 0L)))
  }
}
