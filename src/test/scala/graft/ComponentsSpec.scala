package graft

import graft.table.Components
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar union-find reference. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are min ids by construction (always union toward the smaller root)
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Every case runs BOTH paths — the adaptive driver union-find (default
    * threshold) and the distributed star rounds (threshold forced to 0) —
    * and asserts they agree. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("a", "b")
    val viaDriver = Components.connectedComponents(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    val viaStars = Components.connectedComponents(df, "a", "b", driverEdgeMax = 0)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaStars, "driver union-find vs distributed star rounds")
    viaDriver
  }

  test("chain collapses to its min node over multiple rounds") {
    val chain = (1L until 40L).map(i => (i - 1, i))
    val got = run(chain)
    assert(got.keySet == (0L until 40L).toSet)
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint cliques, stars and chains label by min id") {
    val edges = Seq(
      (10L, 11L), (11L, 12L), (10L, 12L),           // triangle
      (20L, 21L), (20L, 22L), (20L, 23L),           // star centered low
      (33L, 30L), (34L, 30L), (35L, 30L),           // star centered high→low hub
      (40L, 41L), (41L, 42L), (42L, 43L), (43L, 44L)) // chain
    val got = run(edges)
    assert(got == ufComponents(edges))
  }

  test("self-loops and nulls dropped; empty graph yields empty output") {
    assert(run(Seq((5L, 5L))).isEmpty)
    val withNull = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("a", "b")
    val got = Components.connectedComponents(withNull, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("randomized graphs match scalar union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 60 + trial * 30
      val edges = Seq.fill(n) {
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)
      }.filter(e => e._1 != e._2)
      assert(run(edges) == ufComponents(edges), s"trial $trial")
    }
  }

  test("mega-star (one hub, 5k leaves) converges in few rounds") {
    val hub = 999999L
    val edges = (1L to 5000L).map(i => (hub, i))
    val got = run(edges)
    assert(got.size == 5001)
    assert(got.values.toSet == Set(1L))
  }

  test("dedupByPairs keeps exactly one min-id row per cluster") {
    val rows = (0L until 10L).map(i => (i, s"doc$i")).toDF("id", "payload")
    // clusters {0,1,2}, {5,6}; 3,4,7,8,9 isolated
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val kept = Components.dedupByPairs(rows, "id", pairs, "a", "b")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L, 5L, 7L, 8L, 9L))
  }

  test("dedupByPairsKeepBest keeps the max-score row, ties break to min id") {
    // clusters {0,1,2} scores (1,9,9) → keeper 1 (max score, tie → min id);
    // {5,6} scores (3,8) → keeper 6; isolated 3,4 always survive
    val rows = Seq((0L, 1.0), (1L, 9.0), (2L, 9.0), (3L, 0.5), (4L, 2.0),
      (5L, 3.0), (6L, 8.0)).toDF("id", "score")
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val kept = Components.dedupByPairsKeepBest(rows, "id", "score", pairs, "a", "b")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 6L))
  }

  test("q_dup_clusters edge relation: multi-hop chains with skip merges") {
    // mirrors the SparkEntry query at a small doc universe 0..49
    val docs = (0L until 50L).toDF("doc_id")
    val e1 = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") > 0)
      .select(col("doc_id").as("a"), (col("doc_id") - 1).as("b"))
    val e2 = docs.filter(col("doc_id") % 11 === 0 && col("doc_id") >= 7)
      .select(col("doc_id").as("a"), (col("doc_id") - 7).as("b"))
    val edges = e1.union(e2).as[(Long, Long)].collect().toSeq
    val got = run(edges)
    assert(got == ufComponents(edges))
    // the %11 skip edges genuinely merge otherwise-separate chains
    assert(got(11L) == 0L && got(22L) == 15L)
  }
}
