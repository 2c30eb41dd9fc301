package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.WordPieceEncode

/** WordPiece tokenization — the third production tokenizer family
  * beside BPE ([[TextOps.bpeLearn]], q114/q116/q140) and unigram-LM
  * ([[Unigram]], q226/q227): a two-role (word-initial vs `##`
  * continuation) subword vocabulary applied by greedy
  * longest-match-first, whole-word [UNK] on failure (the BERT
  * tokenizer's public algorithm).
  *
  * Vocabulary derivation here is the frequency-threshold flavor: every
  * substring of length 1..maxPieceLen of the corpus' words, counted by
  * ROLE (position 0 = initial, later = continuation) and weighted by
  * word occurrences; pieces with count ≥ minCount survive. The count
  * runs over the DISTINCT-word table (vocabulary-sized, the
  * [[Unigram.learn]] shape — the corpus is touched once for the word
  * count), and the vocabulary collects to the driver (vocab-sized, the
  * bpeLearn/centroid class) to ride a compiled
  * [[graft.functions.WordPieceEncode]] node into the scan's codegen
  * stage.
  *
  * Everything is integer counting and string equality — no floats —
  * so the whole pipeline (vocabulary AND greedy segmentation) replays
  * exactly in the differential oracle (q233's unrolled per-step CTEs).
  */
object WordPiece {

  /** Two-role vocabulary, deterministically ordered (piece asc within
    * role) — order only matters for reproducible display; matching is
    * set-membership. */
  case class Vocab(init: Seq[(String, Long)], cont: Seq[(String, Long)],
                   maxPieceLen: Int, maxWordLen: Int) {
    def initPieces: Seq[String] = init.map(_._1)
    def contPieces: Seq[String] = cont.map(_._1)
  }

  /** Learn the two-role vocabulary from `corpus(textCol)`: lowercased
    * whitespace words of length 1..maxWordLen, substrings of length
    * 1..maxPieceLen by role, kept at count ≥ minCount. */
  def learn(corpus: DataFrame, textCol: String, maxPieceLen: Int = 4,
            maxWordLen: Int = 12, minCount: Long = 2L): Vocab = {
    require(maxPieceLen >= 1 && maxWordLen >= 1 && minCount >= 1)
    val words = corpus
      .select(explode(split(trim(col(textCol)), "\\s+")).as("__w0"))
      .select(lower(col("__w0")).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val pieces = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("st"))
      .select(col("word"), col("cnt"), col("st"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("st") + 1)))
          .as("l"))
      .select((col("st") > 1).as("cont"),
        expr("substring(word, st, l)").as("piece"), col("cnt"))
      .groupBy("cont", "piece").agg(sum(col("cnt")).as("c"))
      .where(col("c") >= minCount)
      .collect() // vocab-sized: distinct (role, piece) survivors
    val init = pieces.filter(!_.getBoolean(0))
      .map(r => (r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val cont = pieces.filter(_.getBoolean(0))
      .map(r => (r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    Vocab(init, cont, maxPieceLen, maxWordLen)
  }

  /** Per-document token count under `vocab` (an [UNK] word counts 1). */
  def tokenCount(text: Column, vocab: Vocab): Column =
    WordPieceEncode.tokenCount(text, vocab.initPieces, vocab.contPieces,
      vocab.maxWordLen)

  /** Per-document [UNK]-word count under `vocab`. */
  def unkCount(text: Column, vocab: Vocab): Column =
    WordPieceEncode.unkCount(text, vocab.initPieces, vocab.contPieces,
      vocab.maxWordLen)

  /** The visible token string (spec/debug form). */
  def tokens(text: Column, vocab: Vocab): Column =
    WordPieceEncode.tokens(text, vocab.initPieces, vocab.contPieces,
      vocab.maxWordLen)

  /** Per-row (id, n_pieces, n_unk) over `docs(idCol, textCol)`. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 vocab: Vocab): DataFrame =
    docs.select(col(idCol),
      tokenCount(col(textCol), vocab).as("n_pieces"),
      unkCount(col(textCol), vocab).as("n_unk"))

  /** DuckDB twin of learn + greedy segmentation, the whole run
    * unrolled: `vocabWordsCte` must define `words(word, cnt)` (the
    * length-capped lowercased corpus words), `targetWordsCte` must
    * define `pw(word)` (the DISTINCT words to segment, empties
    * filtered). Builds `vocab(cont, piece, c)` by the same two-role
    * substring count, then `maxWordLen` greedy steps — per step the
    * LONGEST equi-joined piece prefix wins, a no-match collapses the
    * word to one [UNK] — landing in `wtok(word, toks, bad)` for
    * `tail` to join back to rows. Pure integer/string arithmetic:
    * bit-identical to the compiled [[graft.functions.WordPieceEncode]]
    * by construction. */
  def wordPieceSql(vocabWordsCte: String, targetWordsCte: String,
                   maxPieceLen: Int, maxWordLen: Int, minCount: Long,
                   tail: String): String = {
    val steps = (1 to maxWordLen).map { i =>
      s"""stc$i AS (
         |  SELECT s.word, s.pos, s.toks,
         |         max(CASE WHEN v.piece IS NOT NULL THEN ln.l END) AS best
         |  FROM st${i - 1} s CROSS JOIN lens ln
         |  LEFT JOIN vocab v
         |    ON v.cont = (s.pos > 1)
         |   AND len(v.piece) = ln.l
         |   AND v.piece = substr(s.word, s.pos, CAST(ln.l AS INT))
         |  WHERE s.bad = 0 AND s.pos <= len(s.word)
         |  GROUP BY 1, 2, 3
         |), st$i AS MATERIALIZED (
         |  SELECT word,
         |         CASE WHEN best IS NULL THEN len(word) + 1
         |              ELSE pos + best END AS pos,
         |         CASE WHEN best IS NULL THEN toks ELSE toks + 1 END AS toks,
         |         CASE WHEN best IS NULL THEN 1 ELSE 0 END AS bad
         |  FROM stc$i
         |  UNION ALL
         |  SELECT word, pos, toks, bad FROM st${i - 1}
         |  WHERE bad = 1 OR pos > len(word)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $vocabWordsCte,
       |lens AS (SELECT unnest(range(1, ${maxPieceLen + 1})) AS l),
       |sub AS (
       |  SELECT w.word, w.cnt, st.s AS st, ln.l AS l
       |  FROM words w,
       |       LATERAL (SELECT unnest(range(1, len(w.word) + 1)) AS s) st,
       |       lens ln
       |  WHERE st.s + ln.l - 1 <= len(w.word)
       |),
       |vocab AS MATERIALIZED (
       |  SELECT (st > 1) AS cont, substr(word, CAST(st AS INT), CAST(l AS INT)) AS piece,
       |         CAST(sum(cnt) AS BIGINT) AS c
       |  FROM sub GROUP BY 1, 2 HAVING sum(cnt) >= $minCount
       |),
       |$targetWordsCte,
       |st0 AS (
       |  SELECT word, CAST(1 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS toks,
       |         0 AS bad
       |  FROM pw WHERE len(word) <= $maxWordLen
       |  UNION ALL
       |  SELECT word, len(word) + 1, CAST(1 AS BIGINT), 1
       |  FROM pw WHERE len(word) > $maxWordLen
       |),
       |$steps,
       |wtok AS (
       |  SELECT word,
       |         CASE WHEN bad = 1 THEN CAST(1 AS BIGINT) ELSE toks END AS toks,
       |         CAST(bad AS BIGINT) AS bad
       |  FROM st$maxWordLen
       |)
       |$tail""".stripMargin
  }
}
