package graft

import graft.table.TableChecks
import org.apache.spark.sql.functions._

/** Column-profiling operators: equi-width histogram and Shannon entropy. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: exact counts, empty buckets emitted, max in last bucket") {
    val df = (Seq.fill(5)(0.0) ++ Seq.fill(3)(2.5) ++ Seq(10.0)).toDF("v")
    val h = TableChecks.histogram(df, "v", 4).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // lo=0, hi=10, w=2.5: [0,2.5)→5, [2.5,5)→3, [5,7.5)→0, [7.5,10]→1
    assert(h.toSeq == Seq((0, 0.0, 2.5, 5L), (1, 2.5, 5.0, 3L),
      (2, 5.0, 7.5, 0L), (3, 7.5, 10.0, 1L)))
  }

  test("histogram: constant column and all-null column do not crash") {
    val const = TableChecks.histogram(Seq(7, 7, 7).toDF("v"), "v", 3).collect()
    assert(const.map(_.getLong(3)).sum == 3L)
    assert(const.head.getLong(3) == 3L) // all in bucket 0 of width 1.0
    val nulls = TableChecks.histogram(
      Seq[Option[Int]](None, None).toDF("v"), "v", 3)
    assert(nulls.count() == 0)
  }

  test("entropy: uniform = log2(k), constant = 0, skew in between") {
    val uni = TableChecks.entropy(
      (0 until 64).map(i => s"k${i % 8}").toDF("c"), "c").head()
    assert(math.abs(uni.getDouble(0) - 3.0) < 1e-6 && uni.getLong(1) == 8L)
    val const = TableChecks.entropy(Seq.fill(10)("x").toDF("c"), "c").head()
    assert(const.getDouble(0) == 0.0 && const.getLong(1) == 1L)
    val skew = TableChecks.entropy(
      (Seq.fill(75)("a") ++ Seq.fill(25)("b")).toDF("c"), "c").head()
    assert(math.abs(skew.getDouble(0) - 0.811278) < 1e-6)
  }
}
