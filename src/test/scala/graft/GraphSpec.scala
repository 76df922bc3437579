package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Graph

/** PageRank pinned against an exact driver-side power iteration on small
  * fixtures (same formula, same IEEE ops — agreement is ~1e-15, asserted
  * at 1e-12), plus the invariants that catch formulation bugs: mass
  * conservation with dangling nodes, and authority ordering.
  */
class GraphSpec extends AnyFunSuite with SparkTestBase {

  /** Reference power iteration over an in-memory edge list. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val uniq = edges.distinct
    val nodes = (uniq.map(_._1) ++ uniq.map(_._2)).distinct.sorted
    val out = uniq.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = nodes.size.toDouble
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val contrib = uniq.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / out(s) }.sum).toMap
      rank = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    rank
  }

  private val fixture: Seq[(Long, Long)] = Seq(
    (1L, 2L), (3L, 2L), (4L, 2L), // node 2: three in-links
    (2L, 5L),                     // 5 inherits 2's authority
    (1L, 3L), (3L, 1L))           // cycle; 5 is dangling
  // node 6 is unreachable except via dangling redistribution
  private val withIsland = fixture :+ ((6L, 1L))

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val s2 = spark; import s2.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), iters, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("matches the exact reference power iteration") {
    for (iters <- Seq(1, 5)) {
      val got = run(withIsland, iters)
      val want = refPageRank(withIsland, iters, 0.85)
      assert(got.keySet == want.keySet)
      for ((k, w) <- want)
        assert(math.abs(got(k) - w) < 1e-12, s"iters=$iters node=$k: " +
          s"got ${got(k)}, want $w")
    }
  }

  test("mass is conserved each round despite dangling nodes") {
    val total = run(fixture, 5).values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"ranks sum to $total")
  }

  test("authority ordering: hub > leaf, duplicate edges collapse") {
    val got = run(fixture, 5)
    // 2 has three in-links (beats source-only 4); 5 is 2's sole successor
    // and inherits ALL its mass, outranking even the hub
    assert(got(5L) > got(2L) && got(2L) > got(4L),
      s"expected rank(5) > rank(2) > rank(4), got $got")
    // parallel edges must not double-count contributions
    assert(run(fixture ++ fixture, 5) == got)
  }
}
