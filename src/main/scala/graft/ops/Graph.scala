package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analysis for corpus curation: PageRank, the standard
  * authority signal a web-scale training pipeline derives from its crawl
  * graph (source/host quality weighting, canonical-document choice inside
  * syndication clusters). Declarative and iterative like
  * [[Dedup.components]] — per iteration ONE equi-shuffle of contributions
  * plus a tiny global aggregate for the dangling mass; `localCheckpoint`
  * holds plan size constant and each round releases the previous round's
  * blocks. Rounds are fixed (power iteration), so cost is
  * `iters × (|E| shuffle)` however large the graph.
  */
object Graph {

  /** Power-iteration PageRank over directed `(src, dst)` edges (parallel
    * edges collapse — the classic unweighted formulation). Every node
    * starts at 1/N; each round
    * `rank' = (1-d)/N + d * (Σ in-contribs + danglingMass/N)`,
    * where nodes without out-edges spread their mass uniformly. Ranks sum
    * to 1 every round (spec-pinned). Returns `(node, rank)`.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val uniq = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    val outDeg = uniq.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = uniq.select(col("src").as("node"))
      .union(uniq.select(col("dst").as("node"))).distinct()
      // degree rides the rank relation so the per-iteration contribution
      // needs no extra join against outDeg
      .join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint(true)
    val n = nodes.count().toDouble
    var ranks = nodes.withColumn("rank", lit(1.0) / n)
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // dangling mass rides the round's plan as a broadcast one-row
      // aggregate instead of a driver `.head` action: one Spark job per
      // round (the checkpoint materialization), not two — the scalar's
      // value and the IEEE arithmetic consuming it are unchanged
      val dangling = ranks.where(col("deg") === 0)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dang"))
      val contribs = uniq
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("deg"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("__dang") / lit(n))).as("rank"))
        .localCheckpoint(true)
      ckptStorage(ranks).foreach(_.unpersist(blocking = false))
      ranks = next
    }
    val out = ranks.select("node", "rank")
    ckptStorage(uniq).foreach(_.unpersist(blocking = false))
    ckptStorage(nodes).foreach(_.unpersist(blocking = false))
    out
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002 majority
    * variant): seed nodes are CLAMPED to their label; every round each
    * unlabeled node adopts the most common label among its in-neighbors
    * (ties to the smallest label — deterministic). Pass symmetrized edges
    * for the undirected formulation. Returns `(node, label)` with `label`
    * null for nodes no seed ever reached.
    *
    * Shape at 100 TB: per round ONE `|E|` equi-shuffle (edges ⋈ current
    * labels) + a vote aggregation whose grain is (node, label) — bounded
    * by `|V| × |labels|` — + an argmax window on that collapsed relation.
    * `localCheckpoint` pins plan growth exactly as [[pageRank]] does.
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val uniq = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    val nodes = uniq.select(col("src").as("node"))
      .union(uniq.select(col("dst").as("node"))).distinct()
    val seed = seeds.select(col("node").cast("long"),
      col("label").cast("long").as("seed_label"))
    var labels = nodes.join(seed, Seq("node"), "left")
      .select(col("node"), col("seed_label"),
        col("seed_label").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val votes = uniq
        .join(labels.where(col("label").isNotNull)
          .select(col("node").as("src"), col("label").as("cand")), "src")
        .groupBy(col("dst").as("node"), col("cand"))
        .agg(count(lit(1)).as("votes"))
      // argmax by (votes desc, cand asc) as ONE struct-max partial
      // aggregation (the naiveBayes argmax trick) instead of a
      // row_number window — same winner, but the exchange carries
      // map-side-combined maxima and no per-partition sort runs
      val best = votes
        .groupBy("node")
        .agg(max(struct(col("votes"), (-col("cand")).as("nc"))).as("m"))
        .select(col("node"), (-col("m.nc")).as("cand"))
      val next = labels.join(best, Seq("node"), "left")
        .select(col("node"), col("seed_label"),
          coalesce(col("seed_label"), col("cand"), col("label"))
            .as("label"))
        .localCheckpoint(true)
      ckptStorage(labels).foreach(_.unpersist(blocking = false))
      labels = next
    }
    val out = labels.select("node", "label")
    ckptStorage(uniq).foreach(_.unpersist(blocking = false))
    out
  }

  /** Co-citation graph: weight(u, v) = number of documents that cite BOTH
    * nodes u and v (hosts, authors, entities …) — the classic relatedness
    * signal from bibliometrics, and for a crawl corpus the cheap
    * host-similarity graph (hosts co-linked by many pages are topically
    * related) that feeds [[pageRank]] / [[labelPropagation]].
    *
    * Input is an exploded citation relation `(docCol, nodeCol)`; empty
    * node strings are dropped, duplicate citations within one document
    * collapse first (a page linking a host 50 times still co-cites once).
    *
    * Shape at 100 TB: one (doc, node) dedup shuffle, then the pair
    * expansion joins the relation WITH ITSELF ON THE DOCUMENT KEY — cost
    * is Σ_doc (links/doc)², bounded by the per-document link count (a
    * page cites tens of hosts), never by corpus size or by node
    * popularity. The final agg collapses onto the (node, node) grain.
    * Contrast a node-keyed self-join, which would square the hottest
    * node's postings.
    */
  def coCitation(citations: DataFrame, docCol: String,
      nodeCol: String): DataFrame = {
    val d = citations
      .select(col(docCol).as("doc"), col(nodeCol).as("node"))
      .where(col("node").isNotNull && col("node") =!= "")
      .distinct()
    d.as("a").join(d.as("b"), Seq("doc"))
      .where(col("a.node") < col("b.node"))
      .groupBy(col("a.node").as("node_l"), col("b.node").as("node_r"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected graph — the standard cohesion/community signal (spam
    * rings and scraper farms cluster; organic link neighborhoods have
    * characteristic coefficients). Input edges may be duplicated or
    * arbitrarily oriented; self-loops drop. Returns
    * `(node, deg, n_tri, coeff)` for every node with `deg >= 2`, where
    * `coeff = 2·n_tri / (deg·(deg−1))` (NULL never occurs — deg ≥ 2).
    *
    * Algorithm: degree-ordered orientation (node-iterator++) — every
    * edge points from the (deg, id)-smaller endpoint, wedges pair a
    * source's out-neighbors in that same total order, and a semi-join
    * against the oriented edges closes them. Each triangle is counted
    * exactly once, and out-degrees are bounded by O(√m), so wedge count
    * is O(m^1.5) — the classic bound — instead of Σ deg² (hub-quadratic)
    * for naive wedge generation. At 100 TB scale this is 3 equi-joins
    * and an aggregation, all hash-partitioned; nothing driver-side.
    */
  def triangles(edges: DataFrame): DataFrame = {
    // ids are cast to long for the degree-ordered orientation; a
    // non-numeric id column (e.g. the string hosts coCitation emits)
    // would cast to NULL and silently drop every edge, so reject it
    // here — map string nodes through a dictionary (dense ids) first
    for (c <- Seq("src", "dst")) {
      val dt = edges.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"triangles: column '$c' must be numeric (got ${dt.simpleString}); " +
          "dictionary-encode string node ids before calling")
    }
    val e = edges.select(least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val oriented = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
        .as("o"))
      .select(col("o.s").as("s"), col("o.t").as("t"), col("o.dt").as("dt"))
    val w1 = oriented.select(col("s"), col("t").as("t1"), col("dt").as("d1"))
    val w2 = oriented.select(col("s"), col("t").as("t2"), col("dt").as("d2"))
    val wedges = w1.join(w2, Seq("s"))
      .where(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("t1") < col("t2")))
    val tris = wedges.join(
        oriented.select(col("s").as("t1"), col("t").as("t2")),
        Seq("t1", "t2"), "left_semi")
      .select(explode(array(col("s"), col("t1"), col("t2"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.where(col("deg") >= 2)
      .join(tris, Seq("n"), "left")
      .select(col("n").as("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        (lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
          (col("deg") * (col("deg") - 1))).as("coeff"))
  }

  /** Personalized (topic-sensitive) PageRank: teleport mass lands ONLY
    * on the seed set (uniformly), so ranks measure proximity to the
    * seeds instead of global authority — "related to these trusted
    * hosts / this user's interests", the standard related-items and
    * trust-propagation ranking. Dangling mass likewise returns to the
    * seeds (the personalization vector IS the restart distribution),
    * and ranks sum to 1 over the graph each round. Nodes unreachable
    * from the seed set converge to rank 0.
    *
    * `seeds` is a one-column (`node`) relation; seeds absent from the
    * graph are ignored, and the seed set must intersect the graph.
    *
    * Same shape as [[pageRank]] at 100 TB: per iteration one |E|
    * equi-shuffle + a node-grain agg, localCheckpoint chain releasing
    * superseded rounds; the restart vector rides the node relation as
    * a 0/(1/|S|) column, costing no extra join per round.
    */
  def pageRankPersonalized(edges: DataFrame, seeds: DataFrame,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val uniq = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct().localCheckpoint(true)
    val outDeg = uniq.groupBy("src").agg(count(lit(1)).as("deg"))
    val seedSet = seeds.select(col("node").cast("long")).distinct()
    val nodes0 = uniq.select(col("src").as("node"))
      .union(uniq.select(col("dst").as("node"))).distinct()
      .join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      .join(seedSet.withColumn("__seed", lit(1)), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("__seed"), lit(0)).as("is_seed"))
      .localCheckpoint(true)
    val nSeeds = nodes0.where(col("is_seed") === 1).count().toDouble
    require(nSeeds > 0, "seed set must intersect the graph")
    val nodes = nodes0.withColumn("s",
      when(col("is_seed") === 1, lit(1.0 / nSeeds)).otherwise(lit(0.0)))
    var ranks = nodes.withColumn("rank", col("s"))
      .select("node", "deg", "s", "rank").localCheckpoint(true)
    for (_ <- 1 to iters) {
      // in-plan broadcast dangling scalar — see [[pageRank]]'s round loop
      val dangling = ranks.where(col("deg") === 0)
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dang"))
      val contribs = uniq
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("deg"), col("s"),
          (lit(1.0 - damping) * col("s") +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("__dang") * col("s"))).as("rank"))
        .localCheckpoint(true)
      ckptStorage(ranks).foreach(_.unpersist(blocking = false))
      ranks = next
    }
    val out = ranks.select("node", "rank")
    ckptStorage(uniq).foreach(_.unpersist(blocking = false))
    ckptStorage(nodes0).foreach(_.unpersist(blocking = false))
    out
  }

  /** Fixed-round k-core peeling: repeatedly delete nodes whose degree in
    * the CURRENT subgraph is < k (and their edges), `rounds` times — the
    * standard density filter (the k-core is where spam rings, scraper
    * farms, and genuinely dense communities live; the 1-core just drops
    * leaves). At convergence (enough rounds) every surviving node has
    * deg ≥ k in the surviving subgraph; with a fixed round budget the
    * result is the round-`rounds` peel — deterministic and exactly
    * SQL-replayable, like [[labelPropagation]]'s fixed-iteration
    * contract. Peeling depth in practice is small (real graphs shed
    * low-degree shells fast); callers needing certified convergence can
    * compare two consecutive rounds' outputs.
    *
    * Input edges may be duplicated or arbitrarily oriented; self-loops
    * drop; node ids must be numeric ([[triangles]]' contract — string
    * ids would cast to NULL and silently empty the graph).
    *
    * Returns `(node, deg)` — the surviving nodes with their degree in
    * the FINAL peeled subgraph.
    *
    * Shape at 100 TB: per round, one degree aggregation (|E| shuffle) +
    * two semi-joins restricting edges to surviving endpoints — all
    * hash-partitioned on node keys, nothing driver-side; each round's
    * edge set localCheckpoints and the previous round's blocks release,
    * so the plan does not grow with `rounds` (the [[pageRank]]
    * discipline). Edge count is non-increasing every round.
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    for (c <- Seq("src", "dst")) {
      val dt = edges.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"kCorePeel: column '$c' must be numeric (got ${dt.simpleString}); " +
          "dictionary-encode string node ids before calling")
    }
    var e = edges.select(least(col("src"), col("dst")).cast("long").as("u"),
        greatest(col("src"), col("dst")).cast("long").as("v"))
      .where(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val deg = e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select("n")
      val next = e
        .join(keep.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("n").as("v")), Seq("v"), "left_semi")
        .localCheckpoint(true)
      ckptStorage(e).foreach(_.unpersist(blocking = false))
      e = next
    }
    val out = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    out
  }

  /** BFS shortest-path distances (in hops) from a seed set, out to
    * `maxHops` — the influence-radius / contamination-blast-radius
    * query ("everything within 3 links of a known-bad host"). Treats
    * the graph as UNDIRECTED; returns `(node, dist)` for every node
    * reached, dist 0 for the seeds themselves. Nodes beyond `maxHops`
    * (or disconnected) are absent. Deterministic: a node's dist is its
    * BFS layer — the minimum hop count — independent of traversal
    * order.
    *
    * Shape at 100 TB: per hop, ONE equi-join of the FRONTIER (not the
    * visited set, not the corpus) against the adjacency relation plus
    * one anti-join against visited — cost tracks the frontier's edge
    * boundary, the [[kCorePeel]] localCheckpoint chain caps lineage,
    * and an exhausted frontier makes remaining rounds no-ops.
    */
  def kHopDistances(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops=$maxHops must be >= 1")
    val dir = edges.select(col("src").cast("long").as("u"),
        col("dst").cast("long").as("v"))
      .where(col("u") =!= col("v"))
    val adj = dir
      .unionAll(dir.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint(true)
    var dist = seeds.select(col("node").cast("long").as("node"))
      .distinct().withColumn("dist", lit(0))
      .localCheckpoint(true)
    var frontier = dist.select("node")
    var prevNext: Option[org.apache.spark.sql.DataFrame] = None
    for (h <- 1 to maxHops) {
      val next = frontier
        .join(adj, frontier("node") === adj("u"))
        .select(col("v").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
        .localCheckpoint(true)
      val merged = dist.unionAll(next).localCheckpoint(true)
      ckptStorage(dist).foreach(_.unpersist(blocking = false))
      // the previous frontier layer is merged into dist by now
      prevNext.flatMap(ckptStorage)
        .foreach(_.unpersist(blocking = false))
      prevNext = Some(next)
      dist = merged
      frontier = next.select("node")
    }
    // dist is an eager localCheckpoint: safe to release its inputs
    ckptStorage(adj).foreach(_.unpersist(blocking = false))
    prevNext.flatMap(ckptStorage).foreach(_.unpersist(blocking = false))
    dist
  }

  private def ckptStorage(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }
}
