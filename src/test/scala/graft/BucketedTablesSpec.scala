package graft

import graft.snapshot.BucketedTables
import org.apache.spark.sql.functions._

/** Bucketed-table layout: the one-time shuffle-into-layout write must make
  * later key-aligned joins and aggregations exchange-free — the property the
  * whole component exists for, asserted on the executed physical plan. */
class BucketedTablesSpec extends SparkSpec {

  private def tmp(sub: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-bucket-$sub")
    d.toString
  }

  test("co-bucketed join and bucket-key agg run with zero shuffle exchanges") {
    import spark.implicits._
    val n = 10000
    val facts = (0 until n).map(i => (i.toLong % 997, s"payload$i", i.toLong))
      .toDF("k", "payload", "seq")
    val dims = (0L until 997L).map(k => (k, s"dim$k")).toDF("k", "name")

    BucketedTables.writeBucketed(facts, "b_facts", tmp("facts"), 8, Seq("k"))
    BucketedTables.writeBucketed(dims, "b_dims", tmp("dims"), 8, Seq("k"))

    val f = BucketedTables.readBucketed(spark, "b_facts")
    val d = BucketedTables.readBucketed(spark, "b_dims")

    // force SMJ so the exchange-elision (not a broadcast) is what's tested
    val joined = f.hint("merge").join(d, "k")
      .groupBy("k").agg(count(lit(1)).as("cnt"), first("name").as("name"))
    assert(BucketedTables.shuffleExchangeCount(joined) === 0,
      "co-bucketed SMJ + bucket-key agg must not re-shuffle")
    assert(joined.count() === 997)

    // the same plan over plain parquet (no bucket metadata) DOES shuffle —
    // pins that the zero above is the bucketing, not a planner accident
    val fp = spark.read.parquet(f.inputFiles.head.replaceAll("/[^/]*$", ""))
    val dp = spark.read.parquet(d.inputFiles.head.replaceAll("/[^/]*$", ""))
    val plainJoined = fp.hint("merge").join(dp, "k")
      .groupBy("k").agg(count(lit(1)).as("cnt"), first("name").as("name"))
    assert(BucketedTables.shuffleExchangeCount(plainJoined) > 0)
  }

  test("bucketed table round-trips rows and enforces key presence") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    BucketedTables.writeBucketed(df, "b_round", tmp("round"), 4, Seq("k"))
    val back = BucketedTables.readBucketed(spark, "b_round")
    assert(back.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException] {
      BucketedTables.writeBucketed(df, "b_bad", tmp("bad"), 4, Seq.empty)
    }
  }
}
