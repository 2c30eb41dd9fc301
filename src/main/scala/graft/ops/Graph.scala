package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Link analysis over edge tables — the graph-shaped signal a corpus
  * pipeline wants from its reference structure (host link graphs for
  * crawl-quality priors, citation graphs, user↔item interaction
  * graphs). Complements [[Dedup.connectedComponents]] (membership)
  * with CENTRALITY.
  *
  * PageRank here is the fixed-iteration power method, expressed as T
  * rounds of (edge ⋈ rank) → per-destination sum — each round ONE
  * key-shuffled aggregation of contribution scalars (never vectors,
  * never the edge payload twice), the exact shape GraphX's Pregel
  * compiles to, with Catalyst handling the join strategy per round.
  * Determinism discipline: the per-destination contribution sum is
  * the only order-sensitive reduction. Each term is quantized to
  * 10⁻¹² units by IEEE multiply + floor — BIT-identical on any
  * engine, unlike a double→DECIMAL cast, whose engine-specific
  * conversion path the round-9 sf0.1 sweep caught diverging by one
  * last-place unit on one of 16,600 seeded ranks — then summed
  * exactly as integers in DECIMAL(38,0) and divided back in one IEEE
  * op. Every remaining operation is row-local IEEE, so T iterations
  * produce bit-identical ranks under any partitioning — and on any
  * engine, which is what lets a full differential oracle exist for
  * an iterative algorithm (the ≤10⁻¹²-per-term floor bias is
  * deterministic and far below ranking resolution).
  *
  * Scale accounting per iteration: one shuffle of |E| (src-keyed
  * join; AQE may broadcast the rank side while it fits — rank rows
  * are node-sized scalars) + one map-side-combined |E|→|V| sum. T is
  * fixed and small; there is no driver-side convergence collect in
  * the loop (callers wanting convergence checks can diff successive
  * rank frames themselves — one extra action, outside this
  * operator's contract).
  */
object Graph {

  /** Fixed-iteration damped PageRank over a DIRECTED edge list
    * (symmetrize for undirected graphs). Nodes = every id appearing
    * as src or dst; out-degree-0 (dangling) nodes receive rank but
    * redistribute none — the standard leaky variant; add reverse
    * edges or self-loops if mass conservation matters.
    *
    * Returns (node, out_deg, rank) after `iters` rounds from the
    * uniform 1/N start. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // Iterative lineage discipline (the [[Dedup.connectedComponents]]
    // pattern, and the reason this is not a naive loop): rank_{t+1}
    // references rank_t TWICE (directly and through its contribution
    // aggregate), so an untruncated loop doubles the plan — and the
    // edge-derivation scans — every round (2^T blowup; the first
    // plan dump of this operator carried 120 scans at T=3). The edge
    // frame is truncated once and each round's rank frame truncates
    // before the next builds on it, with superseded checkpoint files
    // rotated away in reliable mode.
    val e = Checkpointing.truncate(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")))
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .join(outDeg, Seq("node"), "left")
      .withColumn("out_deg", coalesce(col("out_deg"), lit(0L)))
    // N rides along as a broadcast literal-free cross join (one-row agg)
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    var ranks = Checkpointing.truncate(nodes.crossJoin(broadcast(nRow))
      .select(col("node"), col("out_deg"),
        (lit(1.0) / col("__n")).as("rank"), col("__n")))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.where(col("out_deg") > 0)
          .select(col("node").as("src"),
            (col("rank") / col("out_deg")).as("__c")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg((sum(floor(col("__c") * lit(1.0e12)).cast("long")
            .cast(DecimalType(38, 0)))
          .cast("string").cast("double") / lit(1.0e12)).as("__s"))
      val prev = ranks
      ranks = Checkpointing.truncate(ranks
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("out_deg"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__s"), lit(0.0))).as("rank"),
          col("__n")))
      Checkpointing.release(prev) // superseded round's stable files
    }
    ranks.select(col("node"), col("out_deg"), col("rank"))
  }

  /** Personalized (seeded) PageRank: teleport mass returns only to
    * the seed set instead of uniformly — the quality-propagation
    * shape (score every page by its link proximity to a TRUSTED seed
    * list, the TrustRank idea), which is how a crawl pipeline turns a
    * small curated domain list into a corpus-wide prior. Seeds not
    * present in the graph are ignored; nodes unreachable from any
    * seed legitimately score 0. Same per-round accounting and DECIMAL
    * determinism as [[pageRank]]. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String, iters: Int,
                           damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = Checkpointing.truncate(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")))
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val seedSet = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().withColumn("__seed", lit(true))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .join(outDeg, Seq("node"), "left")
      .withColumn("out_deg", coalesce(col("out_deg"), lit(0L)))
      .join(seedSet, Seq("node"), "left")
      .withColumn("__seed", coalesce(col("__seed"), lit(false)))
    val nsRow = nodes.agg(sum(col("__seed").cast("long")).as("__ns"))
    def teleport: Column =
      when(col("__seed"), lit(1.0 - damping) / col("__ns")).otherwise(lit(0.0))
    var ranks = Checkpointing.truncate(nodes.crossJoin(broadcast(nsRow))
      .select(col("node"), col("out_deg"), col("__seed"), col("__ns"),
        when(col("__seed"), lit(1.0) / col("__ns")).otherwise(lit(0.0))
          .as("rank")))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.where(col("out_deg") > 0)
          .select(col("node").as("src"),
            (col("rank") / col("out_deg")).as("__c")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg((sum(floor(col("__c") * lit(1.0e12)).cast("long")
            .cast(DecimalType(38, 0)))
          .cast("string").cast("double") / lit(1.0e12)).as("__s"))
      val prev = ranks
      ranks = Checkpointing.truncate(ranks
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("out_deg"), col("__seed"), col("__ns"),
          (teleport + lit(damping) * coalesce(col("__s"), lit(0.0)))
            .as("rank")))
      Checkpointing.release(prev)
    }
    ranks.select(col("node"), col("out_deg"), col("rank"))
  }

  /** DuckDB twin of [[personalizedPageRank]] (`edgesCte` defines
    * e(src, dst); `seedsCte` defines seeds(node)). */
  def personalizedPageRankSql(edgesCte: String, seedsCte: String,
                              iters: Int, damping: Double = 0.85): String = {
    require(iters >= 1)
    val dsum = "CAST(CAST(SUM(CAST(CAST(floor(r.rank / r.out_deg * " +
      "1000000000000.0) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) " +
      "AS DOUBLE) / 1000000000000.0"
    val tele = s"CASE WHEN n.seed THEN ${1.0 - damping} / " +
      "(SELECT n FROM ns) ELSE 0.0 END"
    val rounds = (1 to iters).map { t =>
      s"""a$t AS (
         |  SELECT e.dst AS node, $dsum AS s
         |  FROM e JOIN r${t - 1} r ON e.src = r.node AND r.out_deg > 0
         |  GROUP BY 1
         |), r$t AS (
         |  SELECT n.node, n.out_deg,
         |         $tele + $damping * COALESCE(a.s, 0.0) AS rank
         |  FROM nodes n LEFT JOIN a$t a ON a.node = n.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |$seedsCte,
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS od
       |        FROM e GROUP BY 1),
       |nodes AS (
       |  SELECT v.node, COALESCE(d.od, 0) AS out_deg,
       |         sd.node IS NOT NULL AS seed
       |  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) v
       |  LEFT JOIN deg d ON d.node = v.node
       |  LEFT JOIN (SELECT DISTINCT node FROM seeds) sd ON sd.node = v.node
       |),
       |ns AS (SELECT CAST(SUM(CASE WHEN seed THEN 1 ELSE 0 END) AS BIGINT)
       |       AS n FROM nodes),
       |r0 AS (SELECT node, out_deg, seed,
       |       CASE WHEN seed THEN 1.0 / (SELECT n FROM ns)
       |            ELSE 0.0 END AS rank
       |       FROM nodes),
       |$rounds
       |SELECT node, out_deg, rank FROM r$iters""".stripMargin
  }

  /** DuckDB twin of [[pageRank]]: the same T rounds unrolled as a CTE
    * chain (`edgesCte` must define relation e(src, dst)). */
  def pageRankSql(edgesCte: String, iters: Int,
                  damping: Double = 0.85): String = {
    require(iters >= 1)
    val dsum = "CAST(CAST(SUM(CAST(CAST(floor(r.rank / r.out_deg * " +
      "1000000000000.0) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) " +
      "AS DOUBLE) / 1000000000000.0"
    val rounds = (1 to iters).map { t =>
      s"""a$t AS (
         |  SELECT e.dst AS node, $dsum AS s
         |  FROM e JOIN r${t - 1} r ON e.src = r.node AND r.out_deg > 0
         |  GROUP BY 1
         |), r$t AS (
         |  SELECT n.node, n.out_deg,
         |         ${1.0 - damping} / (SELECT n FROM nn) +
         |           $damping * COALESCE(a.s, 0.0) AS rank
         |  FROM nodes n LEFT JOIN a$t a ON a.node = n.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgesCte,
       |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS od
       |        FROM e GROUP BY 1),
       |nodes AS (
       |  SELECT v.node, COALESCE(d.od, 0) AS out_deg
       |  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) v
       |  LEFT JOIN deg d ON d.node = v.node
       |),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (SELECT node, out_deg, 1.0 / (SELECT n FROM nn) AS rank
       |       FROM nodes),
       |$rounds
       |SELECT node, out_deg, rank FROM r$iters""".stripMargin
  }

  /** Synchronous label-propagation communities (LPA): every node
    * starts labeled with its own id; each round it adopts the label
    * MOST FREQUENT among its in-neighbors (ties to the smallest
    * label; nodes with no in-edges keep theirs). Unlike
    * [[Dedup.connectedComponents]]' hash-min (membership = reachable
    * set), frequency voting finds DENSE communities inside one
    * component — the crawl-graph use is host clustering where
    * everything is weakly connected but neighborhoods matter.
    * Callers symmetrize `edges` for the undirected reading.
    *
    * Everything is INTEGER arithmetic (labels, vote counts) and the
    * per-node argmax is the total order (count desc, label asc), so T
    * synchronous rounds are bit-portable with no decimal machinery —
    * the full unrolled-CTE differential oracle exists for free
    * ([[labelPropagationSql]]).
    *
    * Scale per round: one |E| src-keyed join carrying (dst, lbl)
    * pairs, one map-side-combined (node, lbl) count, one node-sized
    * argmax, one node-keyed carry join. Fixed T, no driver collect;
    * same per-round lineage truncation + checkpoint rotation as
    * [[pageRank]] (rank_{t+1} references rank_t twice).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = Checkpointing.truncate(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")))
    var labels = Checkpointing.truncate(
      e.select(col("src").as("node"))
        .unionAll(e.select(col("dst").as("node"))).distinct()
        .withColumn("lbl", col("node")))
    for (_ <- 1 to iters) {
      val votes = e
        .join(labels.select(col("node").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("__c"))
        .groupBy("node")
        .agg(min(struct((-col("__c")).as("nc"), col("lbl").as("l")))
          .as("__w"))
        .select(col("node"), col("__w.l").as("__new"))
      val prev = labels
      labels = Checkpointing.truncate(
        labels.join(votes, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("__new"), col("lbl")).as("lbl")))
      Checkpointing.release(prev)
    }
    labels
  }

  /** Community detection — the Louvain local-move phase (Blondel et
    * al. 2008, "Fast unfolding of communities in large networks")
    * made DETERMINISTIC and engine-portable, the corpus-clustering
    * companion to [[labelPropagation]] (LPA maximizes neighbor
    * agreement; this maximizes MODULARITY, the standard
    * topic/domain-grouping objective for mixture design).
    *
    * Determinism (the known Louvain blocker is sweep-order
    * sensitivity) is solved the way the catalog always solves it —
    * canonical schedule + exact arithmetic:
    *
    *  - SYNCHRONOUS parity rounds: in round t only nodes with
    *    `node % 2 == t % 2` may move, all deciding simultaneously
    *    against the round-(t−1) assignment. No sweep order exists at
    *    all; alternating parities breaks the two-cycle oscillation
    *    synchronous label moves are known for.
    *  - EXACT integer gain comparison: moving node i (degree k_i)
    *    from community a to b improves modularity iff
    *    `k_{i→b} − k_i·Σtot(b)/2m  >  k_{i→a\i} − k_i·(Σtot(a)−k_i)/2m`.
    *    Multiplied through by 2m this is a pure-integer comparison
    *    `2m·k_{i→c} − k_i·Σtot'(c)` — computed in DECIMAL(38,0)
    *    (HUGEINT in the oracle), so there is no float in the
    *    decision path and the argmax is bit-identical on any engine
    *    and any partitioning.
    *  - Tie-breaks: highest gain, then SMALLEST candidate community
    *    id; strict improvement only (gain equal to staying ⇒ stay).
    *
    * One round costs one |E| shuffle (edge ⋈ assignment, partial-agg
    * to (node, neighbor-community) weights) plus community-table-
    * sized joins — the q203 lineage discipline (truncate + release)
    * keeps the T-round plan linear. Input edges must be SYMMETRIZED
    * (both directions present) with no self-loops; weights are edge
    * multiplicities (pass pre-aggregated multi-edges as repeated
    * rows or symmetrize upstream).
    *
    * Returns (node, community) after `iters` rounds from singleton
    * start. Communities are labeled by one member's node id (not
    * canonicalized to min-member — callers wanting canonical labels
    * re-label with a min-over-community, as the catalog query does). */
  def louvain(edges: DataFrame, srcCol: String, dstCol: String,
              iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val dec = DecimalType(38, 0)
    val e = Checkpointing.truncate(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .where(col("src") =!= col("dst")))
    // weighted degree k_i and the 2m scalar (total directed weight)
    val deg = Checkpointing.truncate(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("k")))
    val m2Row = deg.agg(sum(col("k")).cast(dec).as("__m2"))
    var comm = Checkpointing.truncate(
      deg.select(col("node"), col("node").as("c")))
    for (t <- 1 to iters) {
      // k_{i→c}: weight from each node to each neighboring community
      val kic = e
        .join(comm.select(col("node").as("dst"), col("c")), Seq("dst"))
        .groupBy(col("src").as("node"), col("c"))
        .agg(count(lit(1)).as("kic"))
      // Σtot(c): total degree inside each community
      val stot = comm.join(deg, Seq("node"))
        .groupBy("c").agg(sum("k").as("stot"))
      // candidates = neighboring communities ∪ the stay option (kic 0
      // when i has no same-parity-round neighbor in its own community)
      val cand = kic
        .unionByName(comm.select(col("node"), col("c"), lit(0L).as("kic")))
        .groupBy("node", "c").agg(sum("kic").as("kic"))
      val scored = cand
        .join(comm.withColumnRenamed("c", "__own"), Seq("node"))
        .join(deg, Seq("node"))
        .join(stot, Seq("c"))
        .crossJoin(broadcast(m2Row))
        .withColumn("__stotx",
          when(col("c") === col("__own"), col("stot") - col("k"))
            .otherwise(col("stot")))
        .withColumn("__gain",
          col("__m2") * col("kic").cast(dec) -
            col("k").cast(dec) * col("__stotx").cast(dec))
      val own = scored.where(col("c") === col("__own"))
        .select(col("node"), col("__gain").as("__gown"))
      val best = scored.where(col("c") =!= col("__own"))
        .groupBy("node")
        .agg(min(struct((-col("__gain")).as("ng"), col("c").as("bc")))
          .as("__b"))
        .select(col("node"), (-col("__b.ng")).as("__gbest"),
          col("__b.bc").as("__cbest"))
      val prev = comm
      comm = Checkpointing.truncate(comm
        .join(own, Seq("node"))
        .join(best, Seq("node"), "left")
        .select(col("node"),
          when(col("node") % 2 === t % 2 &&
              col("__gbest") > col("__gown"),
            col("__cbest")).otherwise(col("c")).as("c")))
      Checkpointing.release(prev)
    }
    comm.select(col("node"), col("c").as("community"))
  }

  /** Mirror of [[louvain]] for the DuckDB oracle: T parity rounds
    * unrolled as CTEs, the gain comparison in HUGEINT (the exact
    * integers Spark computes in DECIMAL(38,0)), argmax as row_number
    * over (gain desc, community asc). `edgesCte` must define
    * `e(src, dst)` — symmetrized, self-loop-free. The final
    * assignment is exposed as CTE `lv(node, community)`; `tail` is
    * the closing SELECT over it (default: dump the assignment). */
  def louvainSql(edgesCte: String, iters: Int,
                 tail: String = "SELECT node, community FROM lv"): String = {
    val rounds = (1 to iters).map { t =>
      s"""kic$t AS MATERIALIZED (
         |  SELECT e.src AS node, c.c AS c, CAST(count(*) AS BIGINT) AS kic
         |  FROM e JOIN cm${t - 1} c ON c.node = e.dst
         |  GROUP BY 1, 2
         |), st$t AS MATERIALIZED (
         |  SELECT c.c, CAST(sum(d.k) AS BIGINT) AS stot
         |  FROM cm${t - 1} c JOIN deg d ON d.node = c.node
         |  GROUP BY 1
         |), cand$t AS (
         |  SELECT node, c, CAST(sum(kic) AS BIGINT) AS kic FROM (
         |    SELECT node, c, kic FROM kic$t
         |    UNION ALL SELECT node, c, 0 FROM cm${t - 1})
         |  GROUP BY 1, 2
         |), sc$t AS MATERIALIZED (
         |  SELECT cand.node, cand.c, cm.c AS own, d.k,
         |         CAST(m.m2 AS HUGEINT) * cand.kic -
         |           CAST(d.k AS HUGEINT) *
         |           (CASE WHEN cand.c = cm.c THEN st.stot - d.k
         |                 ELSE st.stot END) AS gain
         |  FROM cand$t cand
         |  JOIN cm${t - 1} cm ON cm.node = cand.node
         |  JOIN deg d ON d.node = cand.node
         |  JOIN st$t st ON st.c = cand.c
         |  CROSS JOIN m2 m
         |), bst$t AS (
         |  SELECT node, c AS cbest, gain AS gbest FROM (
         |    SELECT node, c, gain, row_number() OVER
         |      (PARTITION BY node ORDER BY gain DESC, c ASC) AS rn
         |    FROM sc$t WHERE c <> own)
         |  WHERE rn = 1
         |), cm$t AS MATERIALIZED (
         |  SELECT cm.node,
         |         CASE WHEN cm.node % 2 = ${t % 2} AND b.gbest > o.gain
         |              THEN b.cbest ELSE cm.c END AS c
         |  FROM cm${t - 1} cm
         |  JOIN (SELECT node, gain FROM sc$t WHERE c = own) o
         |    ON o.node = cm.node
         |  LEFT JOIN bst$t b ON b.node = cm.node
         |)""".stripMargin
    }
    s"""WITH $edgesCte,
       |deg AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS BIGINT) AS k
       |        FROM e WHERE src <> dst GROUP BY 1),
       |m2 AS (SELECT CAST(sum(k) AS BIGINT) AS m2 FROM deg),
       |cm0 AS MATERIALIZED (SELECT node, node AS c FROM deg),
       |${rounds.mkString(",\n")},
       |lv AS (SELECT node, c AS community FROM cm$iters)
       |$tail""".stripMargin
  }

  /** Mirror of [[labelPropagation]] for the DuckDB oracle: the same T
    * rounds unrolled as CTEs, the argmax as row_number over
    * (count desc, label asc) — the identical total order. `edgesCte`
    * must define `e(src, dst)`. */
  def labelPropagationSql(edgesCte: String, iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""v$t AS (
         |  SELECT e.dst AS node, l.lbl, CAST(count(*) AS BIGINT) AS c
         |  FROM e JOIN l${t - 1} l ON l.node = e.src
         |  GROUP BY 1, 2
         |), w$t AS (
         |  SELECT node, lbl FROM (
         |    SELECT node, lbl, row_number() OVER
         |      (PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn
         |    FROM v$t)
         |  WHERE rn = 1
         |), l$t AS (
         |  SELECT l.node, coalesce(w.lbl, l.lbl) AS lbl
         |  FROM l${t - 1} l LEFT JOIN w$t w ON w.node = l.node
         |)""".stripMargin
    }
    s"""WITH $edgesCte,
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |l0 AS (SELECT node, node AS lbl FROM n),
       |${rounds.mkString(",\n")}
       |SELECT node, lbl FROM l$iters""".stripMargin
  }
}
