package graft

import graft.operators.Graph

/** Integer PageRank vs a naive loop oracle: random digraphs with hubs,
  * dangling nodes, self-loops, and isolated nodes; exact equality at
  * every iteration count (integer arithmetic leaves no tolerance). */
class GraphSpec extends SparkFunSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val n = 40
  // skewed out-degrees; node 0 is a hub target; nodes 37..39 stay isolated
  private val edges: Seq[(Long, Long)] = (for {
    s <- 0 until 30; _ <- 0 until (1 + rnd.nextInt(4))
  } yield (s.toLong, if (rnd.nextInt(3) == 0) 0L else rnd.nextInt(37).toLong))
    .distinct.filter { case (s, d) => s != d }

  private def brute(iters: Int, scale: Long): Map[Long, Long] = {
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = (0L until n).map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outDeg(s) }.sum).toMap
      r = (0L until n).map(v =>
        v -> (scale * 15 / 100 + 85 * in.getOrElse(v, 0L) / 100)).toMap
    }
    r
  }

  test("pageRankInt equals the naive loop exactly at iters 0..4") {
    val nodes = (0L until n).toDF("id")
    val edf = edges.toDF("src", "dst")
    for (iters <- 0 to 4) {
      val got = Graph.pageRankInt(nodes, edf, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === brute(iters, 1000000000L), s"iters=$iters")
    }
  }

  test("pageRankInt: rank mass never increases (leaks only via dangling/rounding)") {
    val nodes = (0L until n).toDF("id")
    val got = Graph.pageRankInt(nodes, edges.toDF("src", "dst"), 3)
      .collect().map(_.getLong(1))
    assert(got.forall(_ >= 150000000L))   // the damped base is the floor
    assert(got.sum <= n * 1000000000L)
  }
}
