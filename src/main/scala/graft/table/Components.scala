package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the clustering step that turns
  * near-duplicate PAIRS (from [[Dedup]]'s exact/MinHash/SimHash/cosine
  * operators) into duplicate GROUPS with one canonical representative per
  * group. The reference validates documents one at a time and has no graph
  * operator; this is part of the training-data-pipeline surface (a dedup
  * pipeline that stops at pairs under-deduplicates: A~B and B~C must collapse
  * A,B,C to one keeper even when A~C was never emitted as a candidate).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log² n) rounds on any graph, each round a constant number of shuffles.
  * Scale design:
  *  - Per-node neighborhood minima are computed with `groupBy(...).agg(min)`
  *    + join-back, NOT `collect_list` or a window: partial aggregation
  *    (map-side combine) reduces a web-scale mega-star (one root with 10⁸
  *    members — exactly what exact-dup groups of boilerplate pages look
  *    like) to one (node, min) row per map partition before the shuffle, and
  *    nothing buffers a neighborhood in memory.
  *  - Edges stay canonical `(hi, lo)` and deduplicated between rounds, so
  *    the working set shrinks monotonically toward one star edge per
  *    non-root node.
  *  - Each round ends in `localCheckpoint` (truncates the iterative lineage;
  *    on a real cluster a reliable `checkpoint` dir serves the same role).
  *  - Convergence is detected by an (edge-count, ⊕ xxhash64(u,v)) checksum —
  *    an O(1)-size driver action per round, no edge-set anti-join.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.table.Components")

  /** Component label (= min reachable node id) for every node that appears in
    * `edges`. Output columns: `node`, `component`. Isolated nodes never enter
    * an edge list — callers `coalesce(component, id)` after a left join, as
    * [[dedupByPairs]] does. Self-loops and null endpoints are dropped. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 30,
                          driverEdgeMax: Int = 2000000): DataFrame = {
    val spark = edges.sparkSession
    val u0 = col(srcCol).cast("long")
    val v0 = col(dstCol).cast("long")
    var e = edges
      .filter(u0.isNotNull && v0.isNotNull && u0 =!= v0)
      .select(greatest(u0, v0).as("u"), least(u0, v0).as("v"))
      .distinct()
      .localCheckpoint()

    def checksum(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent and overflow-free under ANSI mode
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var prev = checksum(e)

    // Adaptive routing, same design as TableChecks.ksStatistic's
    // driverDomainMax: the EDGE-LIST size, not the corpus size, decides the
    // path. Near-dup edge lists are dup_rate-sized — ≤ driverEdgeMax edges
    // (~32 MB of (u,v) longs at the default) is exact min-label union-find
    // in one collect, skipping O(log² n) latency-bound shuffle rounds
    // (measured 5 s → sub-second on a 10⁶-edge chain graph). Larger edge
    // lists — the genuine web-scale case — run the distributed star rounds
    // below, which parallelize.
    if (prev._1 <= driverEdgeMax) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      e.select("u", "v").collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        // union by MIN id: the root is always the smallest member, matching
        // the distributed rounds' min-label semantics
        if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
      }
      val out = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
      parent.keySet().forEach { n =>
        out.add(org.apache.spark.sql.Row(n, find(n)))
      }
      return spark.createDataFrame(out,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("component",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }

    var it = 0
    var converged = prev._1 == 0L
    while (!converged && it < maxIter) {
      // large-star: symmetrize; for each node a, attach every LARGER
      // neighbor b to m(a) = min(Γ(a) ∪ {a}). Emitted pairs are already
      // canonical: b > a ≥ m(a).
      val sym = e.select(col("u").as("a"), col("v").as("b"))
        .union(e.select(col("v").as("a"), col("u").as("b")))
      val largeMins = sym.groupBy("a").agg(min(col("b")).as("nmin"))
        .select(col("a"), least(col("nmin"), col("a")).as("m"))
      val afterLarge = sym.join(largeMins, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("u"), col("m").as("v"))
        .distinct()

      // small-star: edges are directed (u > v); for each u with smaller
      // neighborhood N = {v…}, m = min(N), attach every x ∈ N ∪ {u}, x ≠ m,
      // to m. Emitted pairs stay canonical (x > m by minimality).
      val smallMins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val joined = afterLarge.join(smallMins, "u")
      val afterSmall = joined
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(smallMins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()

      val cur = checksum(afterSmall)
      converged = cur == prev
      prev = cur
      e = afterSmall
      it += 1
    }
    if (!converged)
      log.warn(s"connectedComponents: not converged after $maxIter rounds; " +
        "labels are an upper bound (some components may remain split)")

    // fixpoint = disjoint stars (u → root v); roots label themselves.
    // groupBy(min) rather than distinct so a maxIter-truncated run still
    // yields one deterministic label per node.
    e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")))
      .groupBy("node").agg(min(col("component")).as("component"))
  }

  /** Keep-one-per-cluster dedup: given rows and a near-dup PAIR list (ids),
    * collapse each connected cluster to its min-id row. The complement of
    * the drop set — pairs in, survivors out. */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                   aCol: String, bCol: String, maxIter: Int = 30): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol, maxIter)
    df.join(cc, col(idCol) === col("node"), "left")
      .filter(col("component").isNull || col("component") === col(idCol))
      .drop("node", "component")
  }

  /** Quality-aware keep-one-per-cluster dedup: instead of the min-id row,
    * each near-dup cluster keeps its BEST row — max `scoreCol`, ties broken
    * by min id so the choice is deterministic and engine-portable. This is
    * what production curation actually does (near-dup clusters keep the
    * longest / highest-quality page, not the one that happened to crawl
    * first); min-id [[dedupByPairs]] remains the arbitrary-representative
    * baseline.
    *
    * Scale shape: the contest runs over (id, score, component) triples only —
    * clustered rows are a dup-rate-sized fraction of the corpus and the
    * payload never shuffles for the decision. The loser set (cluster size − 1
    * per cluster) anti-joins back against the unshuffled input, AQE
    * broadcasting it while small. */
  def dedupByPairsKeepBest(df: DataFrame, idCol: String, scoreCol: String,
                           pairs: DataFrame, aCol: String, bCol: String,
                           maxIter: Int = 30): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol, maxIter)
    // only rows that appear in the pair graph are contested; everything else
    // survives untouched (inner join keeps the contest edge-list-sized)
    val contested = df
      .select(col(idCol).cast("long").as("_id"), col(scoreCol).as("_score"))
      .join(cc, col("_id") === col("node"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component")).orderBy(col("_score").desc, col("_id"))
    val losers = contested.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") =!= 1).select(col("_id"))
    df.join(losers, col(idCol).cast("long") === col("_id"), "left_anti")
  }
}
