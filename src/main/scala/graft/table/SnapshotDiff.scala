package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-for-row snapshot comparison on a key column — the north star's
  * "verified row-for-row including token-array equality" contract, as a
  * first-class dataset operator: given two snapshots of the same table
  * (e.g. this run's output vs the reference baseline, or Iceberg snapshot N
  * vs N-1), emit exactly the rows whose key is missing on one side or whose
  * compared columns differ, tagged `added` / `removed` / `changed` with the
  * list of differing column names.
  *
  * Comparison is null-safe (`<=>`), so `tokens: array<int>` columns compare
  * element-wise including null elements and null-vs-empty distinctions —
  * the token-array-equality join the survey maps to a sort-merge join
  * (SURVEY §2.6 "Join types needed").
  *
  * Scale shape (10^12 rows/side):
  *  - both sides are pruned to key + compared columns BEFORE the join — the
  *    scan never reads unrelated payload (verified by PlanAudit ReadSchema);
  *  - one full-outer sort-merge join on the key is the whole plan: each side
  *    shuffles once on the key, or zero times if both snapshots are already
  *    bucketed/partitioned by it (the optimizer drops satisfied exchanges);
  *  - the diff verdict + changed-column list are pure codegen'd column
  *    expressions — no second pass, no driver state;
  *  - output is diff-sized (normally ≪ input), so downstream consumers see
  *    only the discrepancy set.
  */
object SnapshotDiff {

  /** Rows differing between `current` and `baseline`, keyed by `key`.
    *
    * @param compareCols columns checked for equality (null-safe); column
    *                    names are reported sorted in `changed_cols`
    * @return one row per differing key:
    *         (key, diff_kind ∈ {added, removed, changed}, changed_cols) —
    *         `added` = key only in current, `removed` = only in baseline,
    *         `changed` = present in both with ≥1 differing compared column
    *         (changed_cols empty for added/removed)
    */
  def snapshotDiff(current: DataFrame, baseline: DataFrame, key: String,
                   compareCols: Seq[String]): DataFrame = {
    val cols = compareCols.sorted
    val cur = current.select((key +: cols).map(col): _*)
      .withColumn("_in_cur", lit(true)).as("cur")
    val base = baseline.select((key +: cols).map(col): _*)
      .withColumn("_in_base", lit(true)).as("base")
    val joined = cur.join(base, col(s"cur.$key") === col(s"base.$key"), "full_outer")
    val changed = array(cols.map(c =>
      when(!(col(s"cur.$c") <=> col(s"base.$c")), lit(c))): _*)
    val changedCols = filter(changed, _.isNotNull)
    val kind = when(col("base._in_base").isNull, lit("added"))
      .when(col("cur._in_cur").isNull, lit("removed"))
      .when(size(changedCols) > 0, lit("changed"))
    joined
      .withColumn("diff_kind", kind)
      .filter(col("diff_kind").isNotNull)
      .select(
        coalesce(col(s"cur.$key"), col(s"base.$key")).as(key),
        col("diff_kind"),
        when(col("diff_kind") === "changed", changedCols)
          .otherwise(array().cast(ArrayType(StringType))).as("changed_cols"))
  }

  /** Convenience verdict: true iff the snapshots are row-for-row identical
    * on the compared columns. Probes with limit(1) — short-circuits on the
    * first discrepancy instead of materializing the full diff. */
  def snapshotsEqual(current: DataFrame, baseline: DataFrame, key: String,
                     compareCols: Seq[String]): Boolean =
    snapshotDiff(current, baseline, key, compareCols).limit(1).count() == 0L

  /** Schema-evolution diff between two snapshots: columns added, removed, or
    * type/nullability-changed. Pure metadata (StructType) comparison — zero
    * jobs, zero scans; the result is a |columns|-row local DataFrame. The
    * standard pre-flight gate before [[snapshotDiff]] or a manifest append:
    * a silently widened or dropped column fails here before any data moves. */
  def schemaDiff(current: DataFrame, baseline: DataFrame): DataFrame = {
    val spark = current.sparkSession
    val cur = current.schema.map(f => f.name -> f).toMap
    val base = baseline.schema.map(f => f.name -> f).toMap
    val rows = (cur.keySet ++ base.keySet).toSeq.sorted.flatMap { name =>
      (cur.get(name), base.get(name)) match {
        case (Some(_), None) =>
          Some((name, "added", cur(name).dataType.sql, null: String))
        case (None, Some(_)) =>
          Some((name, "removed", null: String, base(name).dataType.sql))
        case (Some(c), Some(b)) if c.dataType != b.dataType =>
          Some((name, "type_changed", c.dataType.sql, b.dataType.sql))
        case (Some(c), Some(b)) if c.nullable != b.nullable =>
          Some((name, "nullability_changed", c.dataType.sql, b.dataType.sql))
        case _ => None
      }
    }
    import spark.implicits._
    rows.toDF("column", "diff_kind", "cur_type", "base_type")
  }
}
