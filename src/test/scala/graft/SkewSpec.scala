package graft

import graft.table.TableChecks
import org.apache.spark.sql.functions._

/** Skew handling (north rule: "skew in source is handled by explicit salting
  * and AQE skew-join splitting"): a pathological hot key must neither break
  * correctness nor collapse the aggregation onto one reducer. */
class SkewSpec extends SparkSpec {

  test("salted uniqueness under a pathological hot key") {
    // 400k rows; 30% share ONE key, rest unique → classic reducer hot spot
    val df = spark.range(0, 400000, 1, 32).selectExpr(
      "case when id % 10 < 3 then 'HOT' else concat('u-', id) end as doc_id")
    val dups = TableChecks.duplicatesSalted(df, "doc_id", salt = 64)
    val rows = dups.collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "HOT")
    assert(rows(0).getLong(1) === 120000L)
    // the salted pre-aggregation really fans the hot key out: phase-1 output
    // carries (key, salt) groups, so the hot key occupies many reducers
    val phase1 = df.withColumn("_salt", pmod(spark_partition_id(), lit(64)))
      .groupBy(col("doc_id"), col("_salt")).agg(count(lit(1)).as("c"))
      .filter(col("doc_id") === "HOT").count()
    assert(phase1 === 32L) // one partial per input partition
  }

  test("composite-key uniqueness: tuple duplicates, partial nulls are keys, all-null rows excluded") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1)), ("a", Some(1)),              // dup tuple
      ("a", Some(2)),                              // unique tuple
      ("b", None), ("b", None),                    // dup with a null member
      (null, None), (null, None)                   // all-null: excluded
    ).toDF("k1", "k2")
    val dups = TableChecks.duplicatesComposite(df, Seq("k1", "k2"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)) -> r.getLong(2)).toMap
    assert(dups == Map(("a", 1) -> 2L, ("b", -1) -> 2L))
    // single-column composite degenerates to duplicatesSalted
    val single = TableChecks.duplicatesComposite(df, Seq("k1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(single == Map("a" -> 3L, "b" -> 2L))
  }

  test("salted and unsalted uniqueness agree on Zipf-skewed sources") {
    val df = graft.tokens.TokenSeqs.synthesize(spark, 50000, seed = 11L,
      violationRate = 0.05, numPartitions = 16)
    val a = TableChecks.duplicates(df.filter(col("doc_id").isNotNull), "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getString(0), r.getLong(1)))
    val b = TableChecks.duplicatesSalted(df.filter(col("doc_id").isNotNull), "doc_id")
      .orderBy("doc_id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty) // the generator injects duplicate doc_ids
  }

  test("jaccard hot-shingle cap bounds the pair fan-out of a stop-shingle") {
    import spark.implicits._
    // 3000 docs sharing a common 3-token prefix (a stop-shingle in EVERY
    // doc: uncapped, it alone generates ~4.5M candidate pairs) plus a
    // genuinely duplicated suffix pair that must still be found
    val docs = (0 until 3000).map { i =>
      // per-doc arithmetic progressions: any cross-doc shingle overlap is a
      // single shingle at most (≪ the 0.5 jaccard threshold)
      val suffix = if (i < 2) Seq(900, 901, 902, 903, 904) // the one real dup pair
                   else (0 until 5).map(k => (i * 31 + k * 7) % 3800 + 100)
      (i.toLong, (Seq(1, 2, 3) ++ suffix).toArray)
    }.toDF("doc_id", "tokens")
    val pairs = graft.table.Dedup.jaccardPairs(docs, "doc_id", "tokens",
      minJaccard = 0.5, maxDocFreq = 100)
    val got = pairs.collect()
    // the capped run must still find the true duplicate pair...
    assert(got.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    // ...and the candidate space stays bounded: the all-docs stop-shingle is
    // capped away, so the result is tiny, not O(3000²)
    assert(got.length < 10)
  }

  test("broadcast RI join keeps the fact side shuffle-free under skew") {
    // 70% of rows hit one dimension value — broadcast join has no hot reducer
    val facts = spark.range(0, 200000, 1, 16).selectExpr("id",
      "case when id % 10 < 7 then 'web' else concat('s-', id % 100) end as source")
    val dim = spark.createDataFrame(Seq(Tuple1("web"))).toDF("source")
    val viol = TableChecks.referentialViolations(facts, dim, "source", "source")
    assert(viol.count() === 60000L)
    val plan = viol.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "RI join must broadcast the dim side")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("large-dim RI matches the broadcast path and never shuffles fact payload") {
    val facts = spark.range(0, 100000, 1, 8).selectExpr("id",
      "concat('k-', id % 1000) as fk", "repeat('x', 50) as payload")
    // dimension covers 990 of the 1000 key values → 10 violating keys
    val dim = spark.range(0, 990, 1, 4).selectExpr("concat('k-', id) as fk")
    val fast = TableChecks.referentialViolationsLargeDim(facts, dim, "fk", "fk")
    val exact = TableChecks.referentialViolations(facts, dim, "fk", "fk")
    assert(fast.count() === exact.count())
    assert(fast.count() === 1000L) // 10 keys × 100 rows each
    assert(fast.select("fk").distinct().count() === 10L)
    // phase 2 must be a broadcast semi-join: the fact scan (with payload)
    // feeds no exchange
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      "violating keys must broadcast back against the unshuffled fact table")
  }

  test("large-dim RI falls back to shuffled anti-join past broadcastKeyMax") {
    val facts = spark.range(0, 5000, 1, 4).selectExpr("id", "concat('k-', id % 500) as fk")
    val dim = spark.range(0, 100, 1, 2).selectExpr("concat('k-', id) as fk") // 400 bad keys
    val out = TableChecks.referentialViolationsLargeDim(facts, dim, "fk", "fk",
      broadcastKeyMax = 16)
    val exact = TableChecks.referentialViolations(facts, dim, "fk", "fk")
    assert(out.count() === exact.count())
  }
}

/** Parity pin: the native SynthTokens generator must be bit-identical to the
  * Column/HOF formulation it replaced (TokenSeqs.synthesize's contract). */
class SynthTokensParitySpec extends SparkSpec {
  test("native SynthTokens equals the xxhash64 HOF formulation") {
    import org.apache.spark.sql.functions._
    val seed = 42L
    val base = spark.range(0, 2000, 1, 4)
    def mixPos(i: org.apache.spark.sql.Column, salt: Int) =
      xxhash64(i, lit(salt), lit(seed)).bitwiseAND(lit(Long.MaxValue))
    val id = col("id")
    val len = (pmod(mixPos(id, 5), lit(512)) + 1).cast("int")
    val hof = transform(sequence(lit(1), len),
      k => pmod(mixPos(id * 2048 + k.cast("long"), 6), lit(4096)).cast("int"))
    val mismatches = base.select(
        hof.as("a"), graft.expr.TextExprs.synthTokens(id, seed, 4096).as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(mismatches == 0)
  }
}

/** Randomized cross-check of the distributed two-phase prefix-sum KS against
  * a driver-side reference computation — pins the bucketing/offset math
  * (incl. collapsed quantile boundaries on skewed domains). */
class KsPrefixSumSpec extends SparkSpec {
  import graft.table.TableChecks

  private def referenceKs(a: Seq[Double], b: Seq[Double]): Double = {
    val domain = (a ++ b).distinct.sorted
    val na = a.size.toDouble; val nb = b.size.toDouble
    domain.map { v =>
      math.abs(a.count(_ <= v) / na - b.count(_ <= v) / nb)
    }.max
  }

  test("ksStatistic matches the scalar reference on random and skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      // trial 3 uses a heavily skewed domain (90% one value) so quantile
      // boundaries collapse; trial 4 uses disjoint supports
      val (xs, ys) =
        if (trial == 3)
          (Seq.fill(500)(5.0) ++ Seq.fill(50)(rnd.nextInt(20).toDouble),
           Seq.fill(400)(5.0) ++ Seq.fill(150)(rnd.nextInt(40).toDouble))
        else if (trial == 4)
          (Seq.fill(300)(rnd.nextInt(100).toDouble),
           Seq.fill(300)(100.0 + rnd.nextInt(100)))
        else
          (Seq.fill(400)(rnd.nextGaussian() * 10), Seq.fill(500)(rnd.nextGaussian() * 12 + trial))
      // force the DISTRIBUTED two-phase prefix-sum path (driverDomainMax=0)
      val got = TableChecks.ksStatistic(
        xs.toDF("v"), ys.toDF("v"), "v", rangeParts = 8, driverDomainMax = 0)
        .collect()(0).getDouble(0)
      val want = referenceKs(xs, ys)
      assert(math.abs(got - want) < 1e-12, s"trial $trial: got $got want $want")
      // the driver-side small-domain path must agree exactly
      val gotDriver = TableChecks.ksStatistic(
        xs.toDF("v"), ys.toDF("v"), "v", rangeParts = 8)
        .collect()(0).getDouble(0)
      assert(math.abs(gotDriver - want) < 1e-12, s"trial $trial driver path: $gotDriver")
    }
  }
}

/** The approximate-ANN contract: LSH top-k recall against the exact
  * brute-force baseline on the real embeddings table. */
class AnnRecallSpec extends SparkSpec {
  import graft.table.Similarity
  import org.apache.spark.sql.functions._

  test("lshTopK recall vs brute force on sf0.001 embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "item_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5))
    val approx = pairs(Similarity.lshTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, numPlanes = 4, numTables = 8))
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"lshTopK recall@5 = $recall%.3f (${(exact & approx).size}/${exact.size})")
    // near-orthogonal random embeddings are the HARD case for sign-LSH;
    // 8 tables of 4 planes must still recover a solid fraction of the
    // exact top-5 while examining far fewer than n² pairs
    assert(recall >= 0.3)
  }

  test("ivfTopK recall vs brute force, deterministic across repartitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "item_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, nlist = 8, nprobe = 3))
    val recall = (exact & ivf).size.toDouble / exact.size
    info(f"ivfTopK recall@5 = $recall%.3f (${(exact & ivf).size}/${exact.size})")
    // probing 3/8 random-init cells over near-orthogonal vectors: expect
    // roughly the probed-mass fraction of the exact top-5
    assert(recall >= 0.2)
    // hash-keyed centroids + rounded-score argmax ⇒ identical results on a
    // repartitioned input (partition order must not leak into the index)
    val ivf2 = pairs(Similarity.ivfTopK(emb.repartition(13), queries,
      "vec_id", "embedding", "query_id", k = 5, nlist = 8, nprobe = 3))
    assert(ivf == ivf2)
    // nprobe = nlist degenerates to exact brute force
    val full = pairs(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", "query_id", k = 5, nlist = 8, nprobe = 8))
    assert(full == exact)
  }
}
