package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.ops.Tables._

/** Training-data-pipeline extensions (dedup, similarity search, text
  * analysis, multimodal) as driver-checkable queries.
  *
  * Oracle-covered where ANSI-SQL-expressible (exact Jaccard pairs, ANN
  * top-k, BPE-ish token counts); heuristic/hash-internal ops (SimHash,
  * language-ID, fingerprints) get the rows-only check plus scalatest
  * coverage.
  */
object CatalogML {
  type Q = (SparkSession, String) => DataFrame

  /** DuckDB CTE chain `tok, sc, mx, lq` computing (keep columns, __txt,
    * pred_lang, quality) from `textExpr` over `src` — the exact list
    * algebra of `TextOps.langIdFromTokens`/`qualityScoreFromTokens`,
    * with the stopword lists interpolated from TextOps so the engines
    * can never drift. Shared by the q39 oracle and the end-to-end
    * pipeline oracle (q77). Tie-break parity: Spark's array_max over
    * struct(score, lang) picks the lexicographically greatest language
    * among equal scores — the CASE checks languages in descending code
    * order for the same effect. */
  private[queries] def langQualitySql(src: String, textExpr: String, keep: String): String = {
    val langs = TextOps.stopwords.keys.toSeq.sorted // de, en, es, fr, zh
    def swList(l: String) =
      TextOps.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
    // |distinct stopwords present| / max(|tokens|, 1), exactly
    // TextOps.langScoreFromTokens (stopword lists are duplicate-free)
    def score(l: String) =
      s"CAST(len(list_filter(${swList(l)}, x -> list_contains(toks, x))) AS DOUBLE)" +
        " / CAST(greatest(len(toks), 1) AS DOUBLE)"
    val scoreCols = langs.map(l => s"${score(l)} AS s_$l").mkString(",\n         ")
    val caseArms = langs.reverse.init.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    val sumScores = langs.map(l => s"s_$l").mkString(" + ")
    s"""tok AS (
       |  SELECT $keep, $textExpr AS __txt,
       |         list_transform(string_split_regex(trim($textExpr), '\\s+'), x -> lower(x)) AS toks
       |  FROM $src
       |), sc AS (
       |  SELECT *,
       |         $scoreCols
       |  FROM tok
       |), mx AS (
       |  SELECT *, greatest(${langs.map(l => s"s_$l").mkString(", ")}) AS m FROM sc
       |), lq AS (
       |  SELECT $keep, __txt, toks,
       |       CASE WHEN m = 0 THEN 'und' $caseArms ELSE '${langs.head}' END AS pred_lang,
       |       (CASE WHEN CAST(greatest(len(regexp_replace(__txt, '\\s', '', 'g')), 1) AS DOUBLE)
       |                  / CAST(greatest(len(toks), 1) AS DOUBLE) BETWEEN 3.0 AND 10.0
       |             THEN 1.0 ELSE 0.0 END
       |        + least(1.0, ($sumScores) * 2.0)
       |        + CAST(len(regexp_replace(__txt, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |          / CAST(greatest(len(__txt), 1) AS DOUBLE)
       |        + CAST(len(list_distinct(toks)) AS DOUBLE)
       |          / CAST(greatest(len(toks), 1) AS DOUBLE)
       |        + CASE WHEN len(__txt) BETWEEN 20 AND 1000000 THEN 1.0 ELSE 0.0 END) / 5
       |         AS quality
       |  FROM mx
       |)""".stripMargin
  }

  /** Recursive CTE chain `tok, sh, p, edges, reach` computing exact
    * transitive near-dup reachability at jaccard >= 0.7 over word
    * 3-gram shingles of `textExpr` drawn from `src` — `SELECT id,
    * min(lbl) FROM reach GROUP BY id` yields (id, cluster). Shared by
    * the q71 clustering oracle, the q84 keep-one oracle, and the q88
    * pipeline-composition oracle (which feeds a filtered CTE). */
  private[queries] def clusterCteSql(src: String = "documents",
                                     textExpr: String = "text",
                                     prefix: String = ""): String =
    s"""${prefix}tok AS (
      |  SELECT doc_id, string_split_regex(trim($textExpr), '\\s+') AS ts FROM $src
      |), ${prefix}sh AS (
      |  SELECT doc_id,
      |         list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                        FOR i IN range(1, greatest(len(ts) - 2, 1) + 1)]) AS sh
      |  FROM ${prefix}tok
      |), ${prefix}p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM ${prefix}sh a JOIN ${prefix}sh b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
      |          / CAST(len(a.sh) + len(b.sh)
      |                 - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) >= 0.7
      |), ${prefix}edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM ${prefix}p
      |  UNION ALL
      |  SELECT id_b, id_a FROM ${prefix}p
      |), ${prefix}reach AS (
      |  SELECT src AS id, src AS lbl FROM ${prefix}edges
      |  UNION
      |  SELECT e.src, r.lbl FROM ${prefix}edges e JOIN ${prefix}reach r ON e.dst = r.id
      |)""".stripMargin

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // MinHash-LSH near-dup pairs, exact-verified at jaccard >= 0.7.
    // Oracle = exact all-pairs Jaccard (runs only at verify scale);
    // the Spark side is the LSH path whose miss probability at the
    // threshold is ~4e-10 (see Dedup.minhashJaccardPairs).
    ("q35_dedup_minhash", (s: SparkSession, d: String) => {
      Dedup.minhashJaccardPairs(table(s, d, "documents"), "doc_id", "text",
          shingleN = 3, threshold = 0.7)
        .orderBy("id_a", "id_b")
    }, Some(
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
        |                        FOR i IN range(1, greatest(len(ts) - 2, 1) + 1)]) AS sh
        |  FROM tok
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
        |         / CAST(len(a.sh) + len(b.sh)
        |                - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
        |        / CAST(len(a.sh) + len(b.sh)
        |               - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin)),

    // SimHash near-dup pairs. The portable md5-derived token hash
    // (Dedup.portableHash64) makes the 64-bit fingerprints engine-
    // independent, so the oracle recomputes them verbatim: per-token
    // ±1 votes per bit, majority assemble, then EXACT all-pairs
    // Hamming <= 3 — which the banded Spark path equals by pigeonhole
    // (<= 3 differing bits leave at least one of the 4×16-bit bands
    // identical, and popcount verification is exact). DuckDB's 64-bit
    // left shift overflow-errors, so the oracle carries the fingerprint
    // as two 32-bit halves; Hamming adds the halves' popcounts.
    ("q36_dedup_simhash", (s: SparkSession, d: String) => {
      Dedup.simhashPairs(table(s, d, "documents"), "doc_id", "text", maxDist = 3,
          tokenHash = Some(Dedup.portableHash64))
        .orderBy("id_a", "id_b")
    }, Some(
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents
        |), th AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(t), 1, 8))::BIGINT AS h_hi,
        |         ('0x' || substr(md5(t), 9, 8))::BIGINT AS h_lo
        |  FROM toks
        |), votes AS (
        |  SELECT doc_id, bit,
        |         sum(CASE WHEN bit < 32
        |                  THEN (h_lo >> bit) & 1
        |                  ELSE (h_hi >> (bit - 32)) & 1 END * 2 - 1) AS v
        |  FROM th CROSS JOIN (SELECT unnest(range(64)) AS bit) bits
        |  GROUP BY doc_id, bit
        |), sims AS (
        |  SELECT doc_id,
        |         sum(CASE WHEN v > 0 AND bit < 32
        |                  THEN (1::BIGINT << bit) ELSE 0 END) AS lo,
        |         sum(CASE WHEN v > 0 AND bit >= 32
        |                  THEN (1::BIGINT << (bit - 32)) ELSE 0 END) AS hi
        |  FROM votes GROUP BY doc_id
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       (bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)))::INT AS hamming
        |FROM sims a JOIN sims b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        |ORDER BY id_a, id_b""".stripMargin)),

    // Exact ANN: top-5 cosine neighbors for the first 100 vectors.
    // Both engines compute the cosine in double precision over the same
    // floats; ties broken by neighbor id.
    ("q37_ann_bruteforce", (s: SparkSession, d: String) => {
      val emb = table(s, d, "embeddings")
      Similarity.bruteForceTopK(
          emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 100)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
          "qid", "qvec", k = 5)
        .orderBy("qid", "rank")
    }, Some(
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 100),
        |j AS (
        |  SELECT q.qid, v.vec_id,
        |         list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
        |                                CAST(v.embedding AS DOUBLE[])) AS cos,
        |         row_number() OVER (PARTITION BY q.qid
        |                            ORDER BY list_cosine_similarity(CAST(q.qvec AS DOUBLE[]),
        |                                                            CAST(v.embedding AS DOUBLE[])) DESC,
        |                                     v.vec_id ASC) AS rank
        |  FROM q JOIN embeddings v ON v.vec_id != q.qid
        |)
        |SELECT qid, rank, vec_id, cos FROM j WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin)),

    // Embedding near-duplicate pairs at cosine >= 0.99, via the
    // scale path (sign-LSH buckets + exact verification; miss prob
    // < 2e-6 per true pair at this threshold, so the exact all-pairs
    // oracle still applies). The broadcast all-pairs variant remains as
    // Dedup.embeddingCosinePairs for small corpora.
    ("q38_dedup_embedding", (s: SparkSession, d: String) => {
      Dedup.embeddingCosinePairsLsh(table(s, d, "embeddings"), "vec_id", "embedding", 0.99)
        .orderBy("id_a", "id_b")
    }, Some(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                              CAST(b.embedding AS DOUBLE[])) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin)),

    // Language-ID heuristic + quality score. Both are pure list/regex
    // algebra, so DuckDB can replicate them exactly; the stopword lists
    // are interpolated from TextOps.stopwords so the two engines can
    // never drift. Tie-break parity: Spark's array_max over
    // struct(score, lang) picks the lexicographically greatest language
    // among equal scores — the CASE below checks languages in descending
    // code order for the same effect.
    ("q39_text_langid", (s: SparkSession, d: String) => {
      // tokenize once, score ten times (see TextOps.lowerTokens)
      spread(table(s, d, "documents"), "doc_id")
        .withColumn("__toks", TextOps.lowerTokens(col("text")))
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          TextOps.langIdFromTokens(col("__toks")).as("pred_lang"),
          TextOps.qualityScoreFromTokens(col("text"), col("__toks")).as("quality"))
        .orderBy("doc_id")
    }, Some(
      s"""WITH ${langQualitySql("documents", "text", "doc_id, lang")}
         |SELECT doc_id, lang AS labeled_lang, pred_lang, quality
         |FROM lq ORDER BY doc_id""".stripMargin)),

    // BPE-ish token counting (regex is dialect-portable: letter runs,
    // digit runs, single punctuation over lowercased text).
    ("q40_text_tokens", (s: SparkSession, d: String) => {
      spread(table(s, d, "documents"), "doc_id")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("ws_tokens"),
          TextOps.tokenCountBpeish(col("text")).as("bpeish_tokens"))
        .orderBy("doc_id")
    }, Some(
      s"""SELECT doc_id,
         |       CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS ws_tokens,
         |       CAST(len(regexp_extract_all(lower(text), '${TextOps.bpeishPattern}')) AS INTEGER) AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin)),

    // Document fingerprints: two independent polynomial rolling hashes
    // (bases 31 and 131, same prime modulus < 2^40) — an order-sensitive
    // fingerprint vector. The arithmetic is bounded modular math, so
    // DuckDB reproduces it bit-exactly with a list_reduce over the
    // character codes. (The xxhash64-based minHashFingerprint is covered
    // by OpsSpec's differential/invariant test — xxhash64 is
    // Spark-internal, no cross-engine oracle exists for it.)
    //
    // Oracle contract: ASCII text only. Spark's ascii() returns the
    // first UTF-8 BYTE of the character while DuckDB's returns the
    // Unicode code point, so the hashes diverge on any non-ASCII char.
    // The driver fixture is pure ASCII (verified); a multilingual
    // corpus needs a byte-level formulation on both sides.
    ("q41_text_fingerprint", (s: SparkSession, d: String) => {
      spread(table(s, d, "documents"), "doc_id")
        .select(col("doc_id"),
          TextOps.rollingHash(col("text")).as("fp_roll"),
          TextOps.rollingHash(col("text"), base = 131L).as("fp_roll2"))
        .orderBy("doc_id")
    }, Some(
      """SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT,
        |    [ascii(c)::BIGINT FOR c IN string_split(text, '')]),
        |    (h, c) -> (h * 31 + c) % 1099511627689) AS fp_roll,
        |  list_reduce(list_prepend(0::BIGINT,
        |    [ascii(c)::BIGINT FOR c IN string_split(text, '')]),
        |    (h, c) -> (h * 131 + c) % 1099511627689) AS fp_roll2
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // Char-n-gram Jaccard near-dup. Oracle = EXACT Jaccard, computed the
    // scalable SQL way (explode distinct 5-grams, self-join on gram,
    // count matches per pair) rather than all-pairs list intersection;
    // the Spark side's LSH recall at the 0.7 threshold is ~99.9%
    // (bands=16, rows=3 — see Dedup.ngramJaccardPairs).
    ("q42_dedup_ngram", (s: SparkSession, d: String) => {
      Dedup.ngramJaccardPairs(table(s, d, "documents"), "doc_id", "text",
          n = 5, threshold = 0.7)
        .orderBy("id_a", "id_b")
    }, Some(
      """WITH sh AS (
        |  SELECT doc_id,
        |         unnest(list_distinct([substring(text, i, 5)
        |                FOR i IN range(1, greatest(len(text) - 4, 1) + 1)])) AS g
        |  FROM documents
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        |), inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS cnt
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |)
        |SELECT id_a, id_b,
        |       CAST(cnt AS DOUBLE) / CAST(sa.n + sb.n - cnt AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(cnt AS DOUBLE) / CAST(sa.n + sb.n - cnt AS DOUBLE) >= 0.7
        |ORDER BY id_a, id_b""".stripMargin)),

    // Near-dup clustering: LSH pair mining → hash-min connected
    // components (keep one representative per cluster — the step after
    // pair mining in a real dedup pipeline). Oracle = exact-Jaccard
    // pairs closed transitively with a recursive CTE; cluster label =
    // min doc_id in the component on both engines.
    ("q71_dedup_clusters", (s: SparkSession, d: String) => {
      val pairs = Dedup.minhashJaccardPairs(table(s, d, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.7)
      Dedup.connectedComponents(pairs).orderBy("id")
    }, Some(
      s"""WITH RECURSIVE ${clusterCteSql()}
        |SELECT id, min(lbl) AS cluster FROM reach GROUP BY id ORDER BY id""".stripMargin)),

    // PII scrubbing: URLs → emails → long digit runs replaced by typed
    // placeholders, counts from the original text. Patterns are ASCII-
    // class-only so the Java and RE2 dialects agree (shared constants in
    // TextOps), making the pass exactly reproducible in DuckDB.
    ("q73_text_scrub", (s: SparkSession, d: String) => {
      spread(table(s, d, "documents"), "doc_id")
        .select(col("doc_id"),
          TextOps.scrubPii(col("text")).as("clean_text"),
          regexp_count(col("text"), lit(TextOps.urlPattern)).as("n_urls"),
          regexp_count(col("text"), lit(TextOps.emailPattern)).as("n_emails"),
          regexp_count(col("text"), lit(TextOps.longNumPattern)).as("n_longnums"))
        .orderBy("doc_id")
    }, Some(
      s"""SELECT doc_id,
         |       regexp_replace(regexp_replace(regexp_replace(text,
         |         '${TextOps.urlPattern}', '[URL]', 'g'),
         |         '${TextOps.emailPattern}', '[EMAIL]', 'g'),
         |         '${TextOps.longNumPattern}', '[NUM]', 'g') AS clean_text,
         |       CAST(len(regexp_extract_all(text, '${TextOps.urlPattern}')) AS INTEGER) AS n_urls,
         |       CAST(len(regexp_extract_all(text, '${TextOps.emailPattern}')) AS INTEGER) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '${TextOps.longNumPattern}')) AS INTEGER) AS n_longnums
         |FROM documents ORDER BY doc_id""".stripMargin)),

    // Sequence packing (concat-and-chunk): shard by id, per-shard window
    // cumsum of token counts, pack = floor(offset / ctx). Aggregated to
    // per-pack stats so the result is a compact, fully deterministic
    // summary of the packing layout.
    ("q74_seq_packing", (s: SparkSession, d: String) => {
      val docs = spread(table(s, d, "documents"), "doc_id")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("toks"))
      graft.ops.Packing.packSequences(docs, "doc_id", "toks",
          ctxLen = 512, numShards = 8)
        .groupBy("shard", "pack")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks").cast("long")).as("pack_tokens"))
        .orderBy("shard", "pack")
    }, Some(
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, shard, toks,
        |         coalesce(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
        |  FROM t
        |)
        |SELECT shard, CAST(floor(start_offset / 512.0) AS BIGINT) AS pack,
        |       count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS pack_tokens
        |FROM o GROUP BY shard, pack ORDER BY shard, pack""".stripMargin)),

    // Approximate distinct via the PORTABLE HLL (md5-bucketed
    // registers, integer-exact harmonic sum, series-ln linear counting
    // — PortableSketches): every arithmetic step is engine-identical,
    // so the ESTIMATE itself is differentially checked, not just row
    // counts. (Spark's builtin approx_count_distinct remains available;
    // this surface exists precisely because its HLL++ bytes aren't
    // reproducible outside the JVM.) Register rows shuffle as
    // (event_type, bucket, max-rho) — ≤ m per group, the mergeable-
    // sketch scaling shape.
    ("q43_agg_approx_distinct", (s: SparkSession, d: String) => {
      import graft.functions.PortableSketches._
      val ev = table(s, d, "events")
      val regs = ev
        .select(col("event_type"), hllDigest(col("user_id")).as("__d"))
        .groupBy(col("event_type"), hllBucket(col("__d")).as("bucket"))
        .agg(max(hllRho(col("__d"))).as("r"))
      val approx = regs.groupBy("event_type")
        .agg(sum(hllRegisterTerm(col("r"))).as("zsum"),
          count(lit(1)).as("present"))
        .select(col("event_type"),
          hllEstimate(col("zsum"), col("present")).as("approx_users"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      approx.join(exact, Seq("event_type")).orderBy("event_type")
    }, Some {
      import graft.functions.PortableSketches._
      s"""WITH regs AS (
         |  SELECT event_type, ${hllBucketSql("d")} AS bucket,
         |         max(${hllRhoSql("d")}) AS r
         |  FROM (SELECT event_type, ${hllDigestSql("user_id")} AS d FROM events)
         |  GROUP BY 1, 2
         |), z AS (
         |  SELECT event_type, sum($hllRegisterTermSql) AS zsum,
         |         count(*) AS present
         |  FROM regs GROUP BY event_type
         |), approx AS (
         |  SELECT event_type,
         |         ${hllEstimateSql("zsum", "present")} AS approx_users
         |  FROM z
         |), exact AS (
         |  SELECT event_type, count(DISTINCT user_id) AS exact_users
         |  FROM events GROUP BY event_type
         |)
         |SELECT event_type, approx_users, exact_users
         |FROM approx JOIN exact USING (event_type)
         |ORDER BY event_type""".stripMargin
    }),

    // Mergeable distinct-count sketches: per-day register sets unioned
    // per event type — the pre-aggregate/reaggregate pattern that lets a
    // 100 TB pipeline answer "distinct users over any date range" from
    // tiny daily sketches instead of raw events. The sketch is the
    // PORTABLE HLL's (day, bucket, r) rows; union = max over days on
    // the same buckets (associative — merge-equals-whole BY
    // CONSTRUCTION, the property OpsSpec pins for the object sketches),
    // and the merged estimate is differentially checked end-to-end.
    ("q75_agg_sketch_merge", (s: SparkSession, d: String) => {
      import graft.functions.PortableSketches._
      val daily = table(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          hllDigest(col("user_id")).as("__d"))
        .groupBy(col("event_type"), col("day"), hllBucket(col("__d")).as("bucket"))
        .agg(max(hllRho(col("__d"))).as("r"))
      val merged = daily.groupBy(col("event_type"), col("bucket"))
        .agg(max(col("r")).as("r"))
      val est = merged.groupBy("event_type")
        .agg(sum(hllRegisterTerm(col("r"))).as("zsum"),
          count(lit(1)).as("present"))
        .select(col("event_type"),
          hllEstimate(col("zsum"), col("present")).as("merged_users"))
      val days = daily.select("event_type", "day").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("n_days"))
      est.join(days, Seq("event_type")).orderBy("event_type")
    }, Some {
      import graft.functions.PortableSketches._
      s"""WITH daily AS (
         |  SELECT event_type, day, ${hllBucketSql("d")} AS bucket,
         |         max(${hllRhoSql("d")}) AS r
         |  FROM (SELECT event_type, CAST(ts AS DATE) AS day,
         |               ${hllDigestSql("user_id")} AS d FROM events)
         |  GROUP BY 1, 2, 3
         |), merged AS (
         |  SELECT event_type, bucket, max(r) AS r
         |  FROM daily GROUP BY event_type, bucket
         |), z AS (
         |  SELECT event_type, sum($hllRegisterTermSql) AS zsum,
         |         count(*) AS present
         |  FROM merged GROUP BY event_type
         |), est AS (
         |  SELECT event_type,
         |         ${hllEstimateSql("zsum", "present")} AS merged_users
         |  FROM z
         |), days AS (
         |  SELECT event_type, count(*) AS n_days
         |  FROM (SELECT DISTINCT event_type, day FROM daily)
         |  GROUP BY event_type
         |)
         |SELECT event_type, merged_users, n_days
         |FROM est JOIN days USING (event_type)
         |ORDER BY event_type""".stripMargin
    }),

    // Corpus vocabulary: exact token frequencies, top 20. Map-side
    // partial counts collapse each partition's explode before the one
    // shuffle; the final top-k is a TakeOrderedAndProject.
    ("q76_text_vocab", (s: SparkSession, d: String) => {
      spread(table(s, d, "documents"), "doc_id")
        .select(explode(TextOps.lowerTokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    }, Some(
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(list_transform(string_split_regex(trim(text), '\s+'),
        |                    x -> lower(x))) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin)),

    // Multimodal: decode over binary payloads via typed mapPartitions.
    // The header parse (PNG/JPEG/GIF) is real (MultimodalSpec); these
    // text-derived payloads are no recognized container, so they take
    // the deterministic fallback: dims from the first two payload BYTES
    // + a SHA-256 — all reproducible in DuckDB by hexing the UTF-8
    // encoding and converting hex digits positionally.
    ("q44_multimodal_decode", (s: SparkSession, d: String) => {
      Multimodal.decode(s,
          Multimodal.mediaFromDocuments(spread(table(s, d, "documents"), "doc_id"),
            "doc_id", "text"))
        .toDF()
        .orderBy("media_id")
    }, Some(
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |         octet_length(encode(text)) AS n,
        |         upper(hex(encode(substring(text, 1, 2)))) AS h2,
        |         sha256(text) AS content_sha
        |  FROM documents
        |), b AS (
        |  SELECT *,
        |         (strpos('0123456789ABCDEF', substring(h2, 1, 1)) - 1) * 16
        |           + (strpos('0123456789ABCDEF', substring(h2, 2, 1)) - 1) AS b0,
        |         (strpos('0123456789ABCDEF', substring(h2, 3, 1)) - 1) * 16
        |           + (strpos('0123456789ABCDEF', substring(h2, 4, 1)) - 1) AS b1
        |  FROM m
        |)
        |SELECT media_id, media_type,
        |       CAST(16 + (b0 * 7) % 1904 AS INTEGER) AS width,
        |       CAST(16 + (b1 * 13) % 1064 AS INTEGER) AS height,
        |       CAST(CASE WHEN media_type = 'audio' THEN 2 ELSE 3 END AS INTEGER) AS channels,
        |       CAST(n AS INTEGER) AS n_bytes,
        |       content_sha
        |FROM b ORDER BY media_id""".stripMargin)),

    // Multimodal: frame sampling (binary slicing, 4 frames per payload).
    // Oracle slices the hex string of the UTF-8 encoding (2 hex chars =
    // 1 byte), which reproduces Spark's byte-level substr exactly even
    // mid-multibyte-character.
    ("q45_multimodal_frames", (s: SparkSession, d: String) => {
      Multimodal.frameSample(
          Multimodal.mediaFromDocuments(table(s, d, "documents"), "doc_id", "text"), 4)
        .select(col("media_id"), col("frame_id"),
          length(col("frame_bytes")).as("frame_len"),
          upper(hex(substring(col("frame_bytes"), 1, 2))).as("frame_head"))
        .orderBy("media_id", "frame_id")
    }, Some(
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         octet_length(encode(text)) AS n,
        |         upper(hex(encode(text))) AS hx
        |  FROM documents
        |), f AS (
        |  SELECT media_id, n, hx,
        |         greatest(CAST(floor(n / 4.0) AS INTEGER), 1) AS flen,
        |         CAST(t.frame_id AS INTEGER) AS frame_id
        |  FROM m, range(4) t(frame_id)
        |)
        |SELECT media_id, frame_id,
        |       CAST(greatest(least(flen, n - frame_id * flen), 0) AS INTEGER) AS frame_len,
        |       substring(hx, frame_id * flen * 2 + 1, 4) AS frame_head
        |FROM f ORDER BY media_id, frame_id""".stripMargin)),

    // Multimodal feature extraction: 16-bin high-nibble byte histogram
    // per payload (a real content feature, not a stub — the binary →
    // fixed-width-vector shape a learned encoder slot uses). Oracle
    // counts hex digits at odd positions of hex(encode(text)): those ARE
    // the byte high nibbles. Lanes unwrapped for the pandas compare.
    ("q80_multimodal_features", (s: SparkSession, d: String) => {
      val feats = Multimodal.byteFeatures(
        Multimodal.mediaFromDocuments(spread(table(s, d, "documents"), "doc_id"),
          "doc_id", "text"))
      feats.select(Seq(col("media_id"), col("media_type"), col("n_bytes")) ++
          (0 until 16).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
        .orderBy("media_id")
    }, Some {
      val digits = "0123456789ABCDEF"
      val lanes = (0 until 16).map(i =>
        s"CAST(len(list_filter(nibs, x -> x = '${digits(i)}')) AS INTEGER) AS f$i")
        .mkString(",\n|       ")
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |         octet_length(encode(text)) AS n_bytes,
         |         upper(hex(encode(text))) AS hx
         |  FROM documents
         |), h AS (
         |  SELECT media_id, media_type, n_bytes,
         |         [hx[i] FOR i IN range(1, len(hx) + 1) IF i % 2 = 1] AS nibs
         |  FROM m
         |)
         |SELECT media_id, media_type, CAST(n_bytes AS INTEGER) AS n_bytes,
         |       $lanes
         |FROM h ORDER BY media_id""".stripMargin
    }),

    // UDAF surface: typed Aggregator (vector centroid per label). Float
    // mean values are partition-order-dependent in the last ulp (like any
    // distributed float mean) → deterministic outputs only (counts/dims)
    // plus rows-only check; exact semantics pinned in FunctionsSpec.
    ("q47_udaf_centroid", (s: SparkSession, d: String) => {
      graft.functions.GraftAggregators.register(s)
      table(s, d, "embeddings").createOrReplaceTempView("embeddings")
      s.sql(
        """SELECT label, count(*) AS n_vectors,
          |       size(graft_centroid(embedding)) AS centroid_dim
          |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)
    }, Some(
      """SELECT label, count(*) AS n_vectors,
        |       CAST(len(embedding) AS INTEGER) AS centroid_dim
        |FROM embeddings GROUP BY label, len(embedding) ORDER BY label""".stripMargin)),

    // Deterministic train/val/test split (md5-of-id membership — pure
    // per-row function, reproducible across partitionings AND engines:
    // the oracle recomputes the same md5-hex-threshold comparison in
    // DuckDB, so the split is fully differentially testable).
    ("q70_sampling_split", (s: SparkSession, d: String) => {
      graft.ops.Sampling.deterministicSplit(table(s, d, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split")
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy("split")
    }, Some(
      s"""SELECT split, count(*) AS n, min(doc_id) AS min_id FROM (
        |  SELECT doc_id,
        |         CASE WHEN md5(CAST(doc_id AS VARCHAR)) <
        |                   '${graft.ops.Sampling.hexThreshold(0.8)}' THEN 'train'
        |              WHEN md5(CAST(doc_id AS VARCHAR)) <
        |                   '${graft.ops.Sampling.hexThreshold(0.9)}' THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin)),

    // Catalyst TypedImperativeAggregate surface: exact top-k heap with
    // O(k) buffers (order-independent → oracle-checkable). The k=5 array
    // is unwrapped into scalar lanes so the driver's pandas compare never
    // sees an array cell (round-1 q69 failure) and the doubles stay
    // bit-exact.
    ("q69_agg_topk", (s: SparkSession, d: String) => {
      graft.functions.TopKValues.register(s)
      table(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag,
          |       element_at(tk, 1) AS top1, element_at(tk, 2) AS top2,
          |       element_at(tk, 3) AS top3, element_at(tk, 4) AS top4,
          |       element_at(tk, 5) AS top5
          |FROM (SELECT l_returnflag, graft_topk(l_extendedprice, 5) AS tk
          |      FROM lineitem GROUP BY l_returnflag)
          |ORDER BY l_returnflag""".stripMargin)
    }, Some(
      """SELECT l_returnflag,
        |       tk[1] AS top1, tk[2] AS top2, tk[3] AS top3, tk[4] AS top4,
        |       tk[5] AS top5
        |FROM (SELECT l_returnflag,
        |             (list(l_extendedprice ORDER BY l_extendedprice DESC))[1:5] AS tk
        |      FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin)),

    // UDF surface: scalar entropy quality signal (UDF by necessity —
    // data-dependent control flow). Oracle: DuckDB's entropy() aggregate
    // is the same base-2 Shannon entropy over the character multiset;
    // both sides round to 6 decimals because FP summation order differs
    // between the UDF's hash-map fold and the aggregate (≈1e-15 relative
    // drift, ~9 orders below the rounding grain). The corpus is pure
    // ASCII (FIXTURES.md), so UTF-16 code units == code points and the
    // two engines agree on "character".
    ("q48_text_entropy", (s: SparkSession, d: String) => {
      graft.functions.GraftUdfs.register(s)
      spread(table(s, d, "documents"), "doc_id")
        .selectExpr("doc_id", "round(graft_char_entropy(text), 6) AS entropy_bits")
        .orderBy("doc_id")
    }, Some(
      """SELECT d.doc_id, round(coalesce(e.ent, 0.0), 6) AS entropy_bits
        |FROM documents d LEFT JOIN (
        |  SELECT doc_id, entropy(ch) AS ent
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |        FROM documents)
        |  GROUP BY doc_id
        |) e USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin)),

    // IVF approximate ANN. Approximate vs BRUTE FORCE (probe recall
    // < 1, pinned by the scalatest recall spec and exact q37) — but the
    // IVF pipeline itself is deterministic, and with the PORTABLE
    // md5-seed centroids every stage (seed model → rn=1 cell
    // assignment → top-nprobe probe → in-cell exact cosine top-k) is
    // reproducible verbatim in SQL. Same full-oracle posture as q101.
    ("q46_ann_ivf", (s: SparkSession, d: String) => {
      val emb = table(s, d, "embeddings")
      Similarity.ivfTopK(
          emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 20)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
          "qid", "qvec", k = 5, portableSeeds = true)
        .orderBy("qid", "rank")
    }, Some(
      """WITH seeds AS (
        |  SELECT vec_id AS cent_id, embedding AS cent_vec
        |  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
        |  LIMIT 16
        |), asg AS (
        |  SELECT vec_id, embedding, cent_id FROM (
        |    SELECT c.vec_id, c.embedding, s.cent_id,
        |           row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |             list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                    CAST(s.cent_vec AS DOUBLE[])) DESC,
        |             s.cent_id ASC) AS rn
        |    FROM embeddings c CROSS JOIN seeds s) WHERE rn = 1
        |), qcells AS (
        |  SELECT qid, qvec, cent_id FROM (
        |    SELECT q.vec_id AS qid, q.embedding AS qvec, s.cent_id,
        |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                    CAST(s.cent_vec AS DOUBLE[])) DESC,
        |             s.cent_id ASC) AS rn
        |    FROM embeddings q CROSS JOIN seeds s WHERE q.vec_id < 20) WHERE rn <= 4
        |), scored AS (
        |  SELECT qc.qid, a.vec_id,
        |         list_cosine_similarity(CAST(qc.qvec AS DOUBLE[]),
        |                                CAST(a.embedding AS DOUBLE[])) AS cos
        |  FROM qcells qc JOIN asg a USING (cent_id)
        |  WHERE qc.qid != a.vec_id
        |)
        |SELECT qid, CAST(rank AS INT) AS rank, vec_id, cos FROM (
        |  SELECT qid, vec_id, cos,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // Repetition / boilerplate signals (Gopher-style quality filters):
    // duplicate-line fraction and the share of the most frequent word
    // 2-/3-gram. Pure list algebra on both engines — counts stay
    // integers until one final double division, so no float drift.
    ("q78_text_repetition", (s: SparkSession, d: String) => {
      val docs = spread(table(s, d, "documents"), "doc_id")
      docs.select(col("doc_id"),
          TextOps.duplicateLineFraction(col("text")).as("dup_line_frac"))
        .join(TextOps.topNgramFractions(docs, "doc_id", "text", 2), Seq("doc_id"), "left")
        .join(TextOps.topNgramFractions(docs, "doc_id", "text", 3), Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_line_frac"),
          coalesce(col("top2gram_frac"), lit(0.0)).as("top2gram_frac"),
          coalesce(col("top3gram_frac"), lit(0.0)).as("top3gram_frac"))
        .orderBy("doc_id")
    }, Some {
      def gramsSql(n: Int) = {
        val concat = (0 until n).map(k => s"ts[i+$k]").mkString(" || ' ' || ")
        s"CASE WHEN len(ts) >= $n THEN [$concat FOR i IN range(1, len(ts) - ${n - 2})] ELSE [] END"
      }
      def topFrac(g: String) =
        s"""CASE WHEN len($g) = 0 THEN 0.0
           |            ELSE CAST(list_max(list_transform($g, g -> len(list_filter($g, x -> x = g)))) AS DOUBLE)
           |                 / CAST(len($g) AS DOUBLE) END""".stripMargin
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         string_split_regex(trim(text), '\\s+') AS ts,
         |         list_filter(string_split_regex(text, '\\n'), l -> len(trim(l)) > 0) AS lines
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, lines, ${gramsSql(2)} AS g2, ${gramsSql(3)} AS g3 FROM tok
         |)
         |SELECT doc_id,
         |       CASE WHEN len(lines) = 0 THEN 0.0
         |            ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
         |                 / CAST(len(lines) AS DOUBLE) END AS dup_line_frac,
         |       ${topFrac("g2")} AS top2gram_frac,
         |       ${topFrac("g3")} AS top3gram_frac
         |FROM g ORDER BY doc_id""".stripMargin
    }),

    // End-to-end training-data pipeline as ONE declarative query:
    // PII scrub → language-ID + quality score → quality filter →
    // exact-dedup (keep min-id representative among survivors) →
    // per-language corpus stats. Every stage is an operator whose
    // parity is already proven (q73, q39, q31); the oracle composes the
    // same CTEs, so this checks that the stages also compose exactly.
    ("q77_pipeline_e2e", (s: SparkSession, d: String) => {
      val scrubbed = spread(table(s, d, "documents"), "doc_id")
        .withColumn("clean", TextOps.scrubPii(col("text")))
      val scored = scrubbed
        .withColumn("__toks", TextOps.lowerTokens(col("clean")))
        .select(col("doc_id"), col("clean"),
          TextOps.langIdFromTokens(col("__toks")).as("pred_lang"),
          TextOps.qualityScoreFromTokens(col("clean"), col("__toks")).as("quality"),
          TextOps.tokenCount(col("clean")).as("toks_n"))
      val filtered = scored.where(col("quality") >= 0.5)
      val kept = Dedup.dropExactDuplicates(filtered, "doc_id", "clean")
      kept.groupBy("pred_lang")
        .agg(count(lit(1)).as("n_docs"),
          dsum(col("quality"), 6).as("sum_quality"),
          sum(col("toks_n").cast("long")).as("total_tokens"))
        .orderBy("pred_lang")
    }, Some(
      s"""WITH scrub AS (
         |  SELECT doc_id,
         |         regexp_replace(regexp_replace(regexp_replace(text,
         |           '${TextOps.urlPattern}', '[URL]', 'g'),
         |           '${TextOps.emailPattern}', '[EMAIL]', 'g'),
         |           '${TextOps.longNumPattern}', '[NUM]', 'g') AS clean
         |  FROM documents
         |), ${langQualitySql("scrub", "clean", "doc_id")},
         |filt AS (SELECT * FROM lq WHERE quality >= 0.5),
         |keep AS (
         |  SELECT * FROM (SELECT f.*, min(doc_id) OVER (PARTITION BY md5(__txt)) AS keep_id
         |                 FROM filt f)
         |  WHERE doc_id = keep_id
         |)
         |SELECT pred_lang, count(*) AS n_docs,
         |       ${dsumSql("quality", 6)} AS sum_quality,
         |       CAST(sum(CAST(len(string_split_regex(trim(__txt), '\\s+')) AS BIGINT)) AS BIGINT) AS total_tokens
         |FROM keep GROUP BY pred_lang ORDER BY pred_lang""".stripMargin))
  )
}
