package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{PortableSketches, UnigramViterbi}

/** Unigram-LM (SentencePiece-family) tokenizer training — the other
  * production tokenizer family beside BPE (round-12 verdict stretch
  * #8): a vocabulary of subword PIECES with log-probability scores,
  * trained by deterministic Viterbi-EM (hard EM, the standard
  * deterministic variant: the E-step segments every word by the
  * single BEST path under current scores instead of full
  * forward-backward expectations), then applied by compiled Viterbi
  * segmentation ([[graft.functions.UnigramViterbi]]).
  *
  * Training loop (all quantities deterministic):
  *  1. seed vocabulary: every substring of length ≤ `maxPieceLen` of
  *     the distinct-word table, corpus-frequency-weighted; ALL single
  *     characters are kept (coverage floor), multi-char candidates
  *     prune to the top `vocabMulti` by (count DESC, piece ASC);
  *  2. scores: ln(cnt) − ln(total) via [[PortableSketches
  *     .lnOfPosLong]] — the engine-portable integer-ln, so scores are
  *     BIT-identical in DuckDB ([[unigramSql]] spells the same tree);
  *  3. E-step: Viterbi-segment the distinct-word table under current
  *     scores (compiled expression, corpus-scan shape), count pieces
  *     weighted by word frequency;
  *  4. M-step: single chars floor at count 1 (never dropped), multi
  *     pieces keep their Viterbi counts and re-prune to `vocabMulti`
  *     (unused pieces drop — EM's vocabulary shrinkage), scores
  *     recompute from the new integer counts; repeat from 3.
  *
  * The ENTIRE run — seeding, every EM round's DP, the prune order,
  * the final segmentation — replays verbatim in SQL
  * ([[unigramSql]]'s unrolled per-position DP + per-step backtrack
  * CTEs, the louvainSql discipline), which is what gives an
  * ITERATIVE trainer a full differential oracle.
  *
  * Scale shape (the reason production trainers are word-count-first):
  * the corpus is touched ONCE (the word count); every EM round runs
  * over the DISTINCT word table — vocabulary-sized, orders of
  * magnitude smaller than the corpus — with the piece table riding
  * into the compiled expression as a reference object (model-sized
  * broadcast, the NB-classifier class). The driver holds only
  * piece-count maps (≤ chars + vocabMulti rows). Words longer than
  * `maxWordLen` are out of the training domain (and segment to 0
  * tokens downstream) — the documented cap that bounds the oracle's
  * DP unroll. */
object Unigram {

  case class Piece(piece: String, cnt: Long, score: Double)

  case class Vocab(pieces: Seq[Piece], maxPieceLen: Int, maxWordLen: Int) {
    def scored: Seq[(String, Double)] = pieces.map(p => (p.piece, p.score))
  }

  /** Distinct lowercased words with corpus frequencies, capped at
    * `maxWordLen` chars — the one corpus pass. */
  def wordTable(corpus: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    corpus.select(explode(TextOps.lowerTokens(col(textCol))).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  private def rescore(counts: Seq[(String, Long)]): Seq[Piece] = {
    val total = counts.iterator.map(_._2).sum
    val lnT = PortableSketches.lnOfPosLong(total)
    counts.map { case (p, c) =>
      Piece(p, c, PortableSketches.lnOfPosLong(c) - lnT)
    }
  }

  /** chars (floored at 1) ∪ top-`vocabMulti` multis by (cnt DESC,
    * piece ASC) — the prune both engines share. */
  private def prune(chars: Seq[String], counts: Map[String, Long],
                    vocabMulti: Int): Seq[(String, Long)] = {
    val ch = chars.sorted.map(c => (c, math.max(counts.getOrElse(c, 0L), 1L)))
    val mu = counts.toSeq.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (-c, p) }.take(vocabMulti)
    ch ++ mu
  }

  /** Train: `emRounds` Viterbi-EM rounds over the word table. */
  def learn(corpus: DataFrame, textCol: String, maxPieceLen: Int = 3,
            maxWordLen: Int = 10, vocabMulti: Int = 40,
            emRounds: Int = 2): Vocab = {
    require(emRounds >= 1, s"emRounds must be >= 1: $emRounds")
    val words = Checkpointing.truncate(
      wordTable(corpus, textCol, maxWordLen))
    // seed candidates: every substring of length 1..maxPieceLen,
    // overlaps included, weighted by word frequency
    val cand = words.select(explode(flatten(transform(
        sequence(lit(1), length(col("word"))), i =>
          transform(sequence(lit(1),
            least(lit(maxPieceLen), length(col("word")) - i + 1)), l =>
            col("word").substr(i, l))))).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
    val chars = cand.where(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val multi0 = cand.where(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(vocabMulti)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val charSet = chars.map(_._1)
    var vocabCnt: Seq[(String, Long)] =
      prune(charSet, (chars ++ multi0).toMap, vocabMulti)
    for (_ <- 1 to emRounds) {
      val scoredNow = rescore(vocabCnt).map(p => (p.piece, p.score))
      // E-step: one pass over the (vocabulary-sized) word table
      val segCounts = words.select(
          explode(UnigramViterbi.pieces(col("word"), scoredNow,
            maxPieceLen, maxWordLen)).as("piece"), col("cnt"))
        .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      vocabCnt = prune(charSet, segCounts, vocabMulti)
    }
    Vocab(rescore(vocabCnt), maxPieceLen, maxWordLen)
  }

  /** Per-document token counts under a trained vocabulary — compiled
    * Viterbi in the scan's codegen stage. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  vocab: Vocab): DataFrame =
    docs.select(col(idCol),
      UnigramViterbi.tokenCount(col(textCol), vocab.scored,
        vocab.maxPieceLen, vocab.maxWordLen).as("n_pieces"))

  // ───────────────────────── DuckDB mirror ─────────────────────────

  private def ln(v: String): String =
    graft.functions.PortableSketches.lnOfIntSql(v)

  /** One DP block under score table `sc`: CTEs `${p}dp_j`
    * (j = 1..maxWordLen), `${p}dpall`, `${p}bt_k`, `${p}pieces` —
    * Viterbi over `words(word, cnt)` with the argmax order
    * (s DESC, l ASC), then the backtrack emitting one piece per
    * step. */
  private def dpBlockSql(p: String, sc: String, maxPieceLen: Int,
                         maxWordLen: Int): String = {
    val dps = (1 to maxWordLen).map { j =>
      val cands = (1 to math.min(maxPieceLen, j)).map { l =>
        s"""      SELECT w.word, d.s + sc.score AS s, $l AS bl
           |      FROM words w
           |      JOIN ${p}dp_${j - l} d ON d.word = w.word
           |      JOIN $sc sc ON sc.piece = substr(w.word, ${j - l + 1}, $l)
           |      WHERE len(w.word) >= $j""".stripMargin
      }.mkString("\n      UNION ALL\n")
      s"""${p}dp_$j AS MATERIALIZED (
         |  SELECT word, s, bl FROM (
         |    SELECT word, s, bl,
         |           row_number() OVER (PARTITION BY word
         |                              ORDER BY s DESC, bl ASC) AS rn
         |    FROM (
         |$cands
         |    )
         |  ) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val dpall = s"""${p}dpall AS MATERIALIZED (
       |${(1 to maxWordLen).map(j =>
          s"  SELECT word, $j AS pos, bl FROM ${p}dp_$j")
          .mkString("\n  UNION ALL\n")}
       |)""".stripMargin
    val bts = (1 to maxWordLen).map { k =>
      s"""${p}bt_$k AS MATERIALIZED (
         |  SELECT b.word, b.cnt, b.pos - d.bl AS pos,
         |         substr(b.word, b.pos - d.bl + 1, d.bl) AS piece
         |  FROM ${p}bt_${k - 1} b
         |  JOIN ${p}dpall d ON d.word = b.word AND d.pos = b.pos
         |  WHERE b.pos > 0
         |)""".stripMargin
    }.mkString(",\n")
    val pieces = s"""${p}pieces AS MATERIALIZED (
       |${(1 to maxWordLen).map(k =>
          s"  SELECT word, cnt, piece FROM ${p}bt_$k")
          .mkString("\n  UNION ALL\n")}
       |)""".stripMargin
    s"""${p}dp_0 AS (SELECT word, CAST(0.0 AS DOUBLE) AS s, 0 AS bl
       |            FROM words),
       |$dps,
       |$dpall,
       |${p}bt_0 AS (SELECT word, cnt, len(word) AS pos FROM words),
       |$bts,
       |$pieces""".stripMargin
  }

  /** Full train(+segment) replay: `wordsCte` must define
    * `words(word, cnt)` — the distinct lowercased word table, already
    * filtered to 1 ≤ len ≤ maxWordLen. Emits `uvocab(piece, cnt,
    * score)` (the trained vocabulary after `emRounds` Viterbi-EM
    * rounds) and `utok(word, toks)` (per-word Viterbi token counts
    * under the FINAL vocabulary); `tail` selects from them. */
  def unigramSql(wordsCte: String, maxPieceLen: Int, maxWordLen: Int,
                 vocabMulti: Int, emRounds: Int, tail: String): String = {
    require(emRounds >= 1)
    def scoreCte(r: Int): String =
      s"""utot$r AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM uv$r),
         |usc$r AS MATERIALIZED (
         |  SELECT piece, cnt,
         |         ${ln("cnt")} - ${ln(s"(SELECT t FROM utot$r)")} AS score
         |  FROM uv$r
         |)""".stripMargin
    def mStep(r: Int): String =
      s"""ucnt${r + 1} AS (
         |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM em${r}pieces GROUP BY 1
         |),
         |uv${r + 1} AS (
         |  SELECT c.piece, greatest(coalesce(n.cnt, 0), 1) AS cnt
         |  FROM uch c LEFT JOIN ucnt${r + 1} n ON n.piece = c.piece
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM ucnt${r + 1} WHERE len(piece) >= 2
         |    ORDER BY cnt DESC, piece ASC LIMIT $vocabMulti)
         |)""".stripMargin
    val init =
      s"""ucand AS MATERIALIZED (
         |  SELECT substr(word, i, l) AS piece, CAST(SUM(cnt) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT word, cnt, i,
         |           unnest(generate_series(1, least($maxPieceLen,
         |                                           len(word) - i + 1))) AS l
         |    FROM (SELECT word, cnt,
         |                 unnest(generate_series(1, len(word))) AS i
         |          FROM words))
         |  GROUP BY 1
         |),
         |uch AS (SELECT piece FROM ucand WHERE len(piece) = 1),
         |uv0 AS (
         |  SELECT piece, cnt FROM ucand WHERE len(piece) = 1
         |  UNION ALL
         |  SELECT piece, cnt FROM (
         |    SELECT piece, cnt FROM ucand WHERE len(piece) >= 2
         |    ORDER BY cnt DESC, piece ASC LIMIT $vocabMulti)
         |),
         |${scoreCte(0)}""".stripMargin
    val rounds = (0 until emRounds).map { r =>
      s"""${dpBlockSql(s"em$r", s"usc$r", maxPieceLen, maxWordLen)},
         |${mStep(r)},
         |${scoreCte(r + 1)}""".stripMargin
    }.mkString(",\n")
    // one more DP under the FINAL scores for the segmentation readout
    val fin = dpBlockSql(s"em$emRounds", s"usc$emRounds", maxPieceLen,
      maxWordLen)
    s"""WITH $wordsCte,
       |$init,
       |$rounds,
       |$fin,
       |uvocab AS (SELECT piece, cnt, score FROM usc$emRounds),
       |utok AS (SELECT word, CAST(count(*) AS BIGINT) AS toks
       |         FROM em${emRounds}pieces GROUP BY word)
       |$tail""".stripMargin
  }
}
