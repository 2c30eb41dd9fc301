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

  /** Symbol-boundary marker for the scored learner's symbol strings
    * (the [[TextOps.BpeMark]] contract: U+0001/U+0002 cannot occur in
    * corpus text). */
  private val Mark = "\u0001"
  /** Continuation-role prefix: the `##` of BERT's WordPiece, carried
    * as one control char so role-tagged symbols can never collide
    * with corpus text containing literal `#`. */
  private val Cont = "\u0002"

  /** LIKELIHOOD-scored WordPiece vocabulary learning (round-14 verdict
    * #6 — the BERT trainer's published selection rule, where
    * [[learn]] is the frequency-threshold flavor): iterative merge
    * rounds over the TWO-ROLE symbolized vocabulary ("word" starts as
    * w, ##o, ##r, ##d), each round merging the adjacent symbol pair
    * maximizing the likelihood gain count(ab) / (count(a)·count(b)) —
    * counts are symbol occurrences in the CURRENT segmentation,
    * weighted by word frequency. Scores compare through the portable
    * ln ([[graft.functions.PortableSketches.lnOfPosLong]] — the
    * unigram-LM discipline): ln n − ln c_l − ln c_r is bit-identical
    * on both engines, so the argmax (score desc, then (l, r) binary
    * asc) and therefore EVERY round replays exactly in the oracle
    * ([[learnScoredSql]]). Merging `l + ##r → l##r` keeps l's role,
    * rewritten corpus-wide as ONE literal non-regex replace over the
    * marker-delimited symbol string (the [[TextOps.bpeApplyMerges]]
    * left-to-right non-overlapping contract every SQL engine shares).
    *
    * Returns the merge table (merge_rank, left_sym, right_sym, merged,
    * n_pair, score) with `##` rendered for the continuation role.
    * Stops early if the pair space exhausts. Scale: the bpeLearn
    * class — ONE corpus wordcount, then vocabulary-sized rounds (one
    * 1-row collect each). */
  def learnScored(docs: DataFrame, textCol: String, rounds: Int,
                  maxWordLen: Int = 12): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    import graft.functions.PortableSketches.lnOfIntFast
    val spark = docs.sparkSession
    var vocab = Checkpointing.truncate(docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("__w0"))
      .select(lower(col("__w0")).as("word"))
      .where(length(col("word")).between(1, maxWordLen))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(Mark), substring(col("word"), 1, 1),
        regexp_replace(expr("substr(word, 2)"), "(.)", Mark + Cont + "$1"))
        .as("syms"), col("cnt")))
    def disp(s: String): String = s.replace(Cont, "##")
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long, Double)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val symsList = split(expr("substr(syms, 2)"), Mark)
      val symCnt = vocab.select(explode(symsList).as("sym"), col("cnt"))
        .groupBy("sym").agg(sum("cnt").as("c"))
      val pairs = vocab.select(symsList.as("a"), col("cnt"))
        .where(size(col("a")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("a")) - 1),
          i => struct(element_at(col("a"), i).as("l"),
            element_at(col("a"), i + 1).as("r")))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("n"))
      val top = pairs
        .join(symCnt.select(col("sym").as("l"), col("c").as("cl")), Seq("l"))
        .join(symCnt.select(col("sym").as("r"), col("c").as("cr")), Seq("r"))
        .select(col("l"), col("r"), col("n"),
          (lnOfIntFast(col("n")) - lnOfIntFast(col("cl")) -
            lnOfIntFast(col("cr"))).as("score"))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        r += 1
        val (l, rr) = (top(0).getString(0), top(0).getString(1))
        val (n, sc) = (top(0).getLong(2), top(0).getDouble(3))
        merges += ((r, disp(l), disp(rr), disp(l + rr.substring(1)), n, sc))
        vocab = vocab.select(call_function("replace", col("syms"),
          lit(Mark + l + Mark + rr), lit(Mark + l + rr.substring(1)))
          .as("syms"), col("cnt"))
        if (r % 8 == 0) vocab = Checkpointing.truncate(vocab)
      }
    }
    import spark.implicits._
    merges.toSeq
      .toDF("merge_rank", "left_sym", "right_sym", "merged", "n_pair", "score")
  }

  /** DuckDB twin of [[learnScored]]: every round unrolled — symbol
    * counts, pair counts, the portable-ln scored argmax, and the
    * literal-replace rewrite — over the same marker-delimited two-role
    * symbol strings. `wordsCte` must define `words(word, cnt)` (the
    * length-capped lowercased corpus words — match the Spark filter).
    * Callers pick `rounds` ≤ the fixture's available merges (an
    * exhausted learner emits fewer rows and fails the gate loudly). */
  def learnScoredSql(wordsCte: String, rounds: Int): String = {
    import graft.functions.PortableSketches.lnOfIntSql
    val steps = (1 to rounds).map { t =>
      s"""syl$t AS (
         |  SELECT string_split(substr(syms, 2), chr(1)) AS a, cnt FROM w${t - 1}
         |), sc$t AS (
         |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT unnest(a) AS sym, cnt FROM syl$t) GROUP BY 1
         |), pc$t AS (
         |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS n FROM (
         |    SELECT a[i] AS l, a[i + 1] AS r, cnt
         |    FROM syl$t, LATERAL (SELECT unnest(range(1, len(a))) AS i) ii)
         |  GROUP BY 1, 2
         |), top$t AS MATERIALIZED (
         |  SELECT l, r, n,
         |         ${lnOfIntSql("n")} - ${lnOfIntSql("cl")} -
         |           ${lnOfIntSql("cr")} AS score
         |  FROM (SELECT p.l, p.r, p.n, a.c AS cl, b.c AS cr
         |        FROM pc$t p
         |        JOIN sc$t a ON a.sym = p.l
         |        JOIN sc$t b ON b.sym = p.r)
         |  ORDER BY score DESC, l ASC, r ASC LIMIT 1
         |), w$t AS MATERIALIZED (
         |  SELECT replace(w.syms, chr(1) || t.l || chr(1) || t.r,
         |                 chr(1) || t.l || substr(t.r, 2)) AS syms, w.cnt
         |  FROM w${t - 1} w CROSS JOIN top$t t
         |)""".stripMargin
    }.mkString(",\n")
    val out = (1 to rounds).map { t =>
      s"""SELECT CAST($t AS INT) AS merge_rank,
         |       replace(l, chr(2), '##') AS left_sym,
         |       replace(r, chr(2), '##') AS right_sym,
         |       replace(l || substr(r, 2), chr(2), '##') AS merged,
         |       n AS n_pair, score
         |FROM top$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $wordsCte,
       |w0 AS MATERIALIZED (
       |  SELECT chr(1) || substr(word, 1, 1) ||
       |         regexp_replace(substr(word, 2), '(.)',
       |                        chr(1) || chr(2) || '\\1', 'g') AS syms,
       |         cnt
       |  FROM words
       |),
       |$steps
       |$out
       |ORDER BY merge_rank""".stripMargin
  }

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
