package graft

/** Plan-hygiene audit tool: prints the formatted physical plan for the
  * named queries (or a default headline set) so scan pruning
  * (ReadSchema/PushedFilters), join strategies, and WholeStageCodegen
  * spans can be inspected. Usage:
  *   runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("rel_pricing_summary", "rel_filter_project", "join_multiway",
        "join_brand_revenue", "sim_knn_topk", "dedup_lsh_pairs",
        "rel_stats_aggs", "join_bloom_prefilter", "rel_unpivot",
        "rel_resample_ffill")
    val spark = GraftSession.build("4")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
