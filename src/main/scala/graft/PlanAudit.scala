package graft

import org.apache.spark.sql.SparkSession

/** Prints condensed physical-plan diagnostics for the headline queries:
  * are filters pushed to the scan, are small sides broadcast, how wide are
  * the whole-stage-codegen spans, is the read schema pruned? */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq("q1_agg", "q_join_agg", "q_ri_violations", "q_dup_salted",
      "q_ann_topk", "q_minhash_lsh", "q_row_violations", "q_window_bucket",
      "q_tdigest_ntok", "q_json_ingest", "q_containment", "q_hot_shingles",
      "q_fuzzy_dedup", "q_snapshot_diff", "q_para_dedup", "q_span_dedup",
      "q_pii_scan", "q_gopher_filter", "q_semantic_dedup",
      "q_chunk_split", "q_pack_assign", "q_packed_seqs", "q_shard_order",
      "q_heavy_hitters", "q_histogram_nchars", "q_entropy_source",
      "q_incremental_manifest",
      "q_token_drift", "q_token_drift_by", "q_expectations_by",
      "q_group_anomaly", "q_infer_profile",
      "q_dup_composite", "q_fd_violations", "q_order_integrity", "q_corr_drift",
      "q_kmeans_refine", "q_dsir_weights", "q_line_dedup", "q_mix_temp",
      "q_mean_pool", "q_repair", "q_split_assign", "q_leak_split",
      "q_sanitize", "q_pack_stats", "q_pruned_read")
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute first: under AQE the pre-execution plan is the INITIAL one,
      // which renders no WholeStageCodegen stages — the final plan does
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan)
        .map(_.take(90)).toSeq.distinct
      val reads = "ReadSchema: [^,\\n]*".r.findAllIn(plan).map(_.take(110)).toSeq.distinct
      val joins = plan.linesIterator.map(_.trim).filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("BroadcastNestedLoop"))
        .map(_.split("\\(").head.replaceAll("^[+*:-]+\\s*", "").trim).toSeq
        .groupBy(identity).map { case (k, v) => s"$k x${v.size}" }
      // executedPlan.toString renders codegen'd operators as "*(N) ..." —
    // count distinct span ids, not the "WholeStageCodegen (N)" UI form.
    val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
      .map(_.group(1)).toSet.size
      println(s"== $name")
      println(s"   joins/exchanges: ${joins.mkString("; ")}")
      println(s"   codegen spans: $codegenSpans")
      pushed.foreach(p => println(s"   $p"))
      reads.foreach(r => println(s"   $r"))
    }
    spark.stop()
  }
}
