package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables._

/** Round-14 additions: incremental k-core maintenance, the HyperANF
  * neighborhood function, WordPiece encoding (the third production
  * tokenizer family), and the EXIF/TIFF tag walk. Bench reports them
  * under the q23x rollup key; per-entry numbers via
  * SPARK_GRAFT_ONLY=q231,…
  */
object CatalogML10 {
  type Q = (SparkSession, String) => DataFrame

  def entries: Seq[(String, Q, Option[String])] = Seq(

    // INCREMENTAL k-core maintenance (round-13 verdict #2): q223
    // re-peels from scratch per crawl; here the stabilized survivor
    // set advances with ONLY delta-touched work — semi-join frontier
    // expansion from the delta's non-core endpoints finds every
    // candidate joiner region (a joiner component must contain a
    // delta endpoint), a static-core-credit peel settles it, and
    // untouched survivors pass through byte-identical. The oracle is
    // the FULL fixed-point peel over the union (k=55 reaches its
    // fixed point in ≤2 rounds at every fixture scale; the unrolled
    // CTE runs 4) — incremental ≡ full, to the hash.
    ("q231_graph_kcore_incremental", (s: SparkSession, d: String) => {
      def pairsOf(pred: Column => Column) = {
        val li = table(s, d, "lineitem")
          .where(pred(col("l_orderkey")))
          .select(col("l_orderkey"), col("l_partkey"))
        li.join(li.select(col("l_orderkey"),
            col("l_partkey").as("__p2")), Seq("l_orderkey"))
          .where(col("l_partkey") < col("__p2"))
          .select(col("l_partkey").as("src"), col("__p2").as("dst"))
      }
      val base = pairsOf(ok => ok % 5 =!= 0)
      val delta = pairsOf(ok => ok % 5 === 0)
      // the maintained survivor set: the BASE graph's stabilized core
      // (base peel depth ≤ 5 at every fixture scale; 9 rounds = fixed
      // point with margin — rounds past it are no-ops)
      val prev = graft.ops.Graph.kCore(base, "src", "dst", k = 55, iters = 9)
      graft.ops.Graph.advanceKCore(prev, base, "src", "dst", delta, k = 55)
        .withColumnRenamed("node", "part_id")
        .orderBy("part_id")
    }, Some(graft.ops.Graph.kCoreSql(
      """p AS (
        |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM lineitem a
        |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |   AND a.l_partkey < b.l_partkey),
        |e0 AS (SELECT a AS src, b AS dst FROM p
        |       UNION ALL SELECT b, a FROM p)""".stripMargin,
      k = 55, iters = 4, nodeAs = "part_id") + "\nORDER BY part_id")),

    // Neighborhood function (HyperANF) over the part–supplier
    // bipartite graph (round-13 verdict #4): per-node portable-HLL
    // registers of the ≤t-hop ball advanced 3 rounds by register
    // max-merge over edges — the distance-distribution signal beside
    // centrality and community. Registers are DATA (the q43/q158
    // posture), so the ENTIRE iterative run — init registers, each
    // round's edge merge, every estimate including the portable-ln
    // linear-counting branch — replays in the oracle as unrolled
    // register-arithmetic CTEs, bit-identical.
    ("q232_graph_neighborhood", (s: SparkSession, d: String) => {
      val edges = table(s, d, "lineitem")
        .where(col("l_partkey") % 3 === 0)
        .select(col("l_partkey").as("src"),
          (col("l_suppkey") + 1000000000L).as("dst"))
      graft.ops.Graph.neighborhoodFunction(edges, "src", "dst", iters = 3)
        .orderBy("node", "t")
    }, Some(graft.ops.Graph.neighborhoodFunctionSql(
      """p AS (
        |  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS a,
        |         CAST(l_suppkey + 1000000000 AS BIGINT) AS b
        |  FROM lineitem WHERE l_partkey % 3 = 0),
        |e AS (SELECT a AS src, b AS dst FROM p
        |      UNION ALL SELECT b, a FROM p)""".stripMargin,
      iters = 3) + "\nORDER BY node, t")),

    // WordPiece encode — the third production tokenizer family beside
    // BPE (q116/q140) and unigram-LM (q226/q227): a two-role
    // (initial vs ## continuation) substring-frequency vocabulary is
    // TRAINED on the documents corpus, then part names segment by
    // greedy longest-match-first with whole-word [UNK] on failure —
    // the cross-domain shape that keeps the [UNK] path live (part
    // names carry letters the documents vocabulary never saw). One
    // compiled reference-object node per output (the BpeEncodeMerges
    // shape); the oracle replays the ENTIRE run — vocabulary count
    // and every greedy step — as unrolled per-step CTEs, pure
    // integer/string arithmetic, to the hash.
    ("q233_wordpiece_encode", (s: SparkSession, d: String) => {
      val vocab = graft.ops.WordPiece.learn(
        table(s, d, "documents").select(col("text")), "text",
        maxPieceLen = 4, maxWordLen = 12, minCount = 2)
      graft.ops.WordPiece.tokenStats(table(s, d, "part"), "p_partkey",
          "p_name", vocab)
        .orderBy("p_partkey")
    }, Some(graft.ops.WordPiece.wordPieceSql(
      vocabWordsCte =
        """dw AS (
          |  SELECT unnest(list_transform(string_split_regex(trim(text), '\s+'),
          |                               x -> lower(x))) AS word
          |  FROM documents
          |),
          |words AS MATERIALIZED (
          |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM dw
          |  WHERE len(word) BETWEEN 1 AND 12 GROUP BY 1
          |)""".stripMargin,
      targetWordsCte =
        """pw AS (
          |  SELECT DISTINCT word FROM (
          |    SELECT unnest(list_transform(string_split_regex(trim(p_name), '\s+'),
          |                                 x -> lower(x))) AS word
          |    FROM part)
          |  WHERE len(word) >= 1
          |)""".stripMargin,
      maxPieceLen = 4, maxWordLen = 12, minCount = 2,
      tail =
        """,
          |partw AS (
          |  SELECT p_partkey, word FROM (
          |    SELECT p_partkey,
          |           unnest(list_transform(string_split_regex(trim(p_name), '\s+'),
          |                                 x -> lower(x))) AS word
          |    FROM part)
          |  WHERE len(word) >= 1
          |)
          |SELECT pr.p_partkey,
          |       CAST(sum(t.toks) AS BIGINT) AS n_pieces,
          |       CAST(sum(t.bad) AS BIGINT) AS n_unk
          |FROM partw pr JOIN wtok t ON t.word = pr.word
          |GROUP BY 1
          |ORDER BY 1""".stripMargin))),
  )
}
