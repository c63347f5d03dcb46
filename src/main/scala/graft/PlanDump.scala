package graft
import java.nio.file.{Files, Paths}
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = Seq("ref_user_events", "ref_daily_summary", "ref_dedup_insert",
      "doc_neardup_minhash", "doc_neardup_simhash", "emb_top3_exact", "emb_topk_lsh",
      "emb_topk_lsh_banded", "emb_neardup_cosine", "doc_stats",
      "doc_fingerprint_native", "ref_pipeline_summary",
      "ref_asof_last_purchase", "ref_range_promo_views", "q5_local_supplier",
      "q1_pricing_summary", "mm_features", "ref_open_envelope",
      "doc_decontaminate", "doc_sample_hash", "doc_sample_stratified",
      "doc_distinct_kmv", "doc_redact_pii", "doc_quality_filter",
      "doc_tfidf_top_terms", "doc_repetition", "doc_source_mix",
      "doc_pack_sequences", "doc_pack_segments", "doc_chunk_overlap",
      "doc_shuffle_epoch", "doc_vocab_topk", "emb_label_centroids",
      "ref_scd2_history", "layout_zorder", "q4_late_shipment",
      "ref_skew_salted_stats", "doc_distinct_kmv_by_source",
      "ref_asof_next_purchase", "ref_value_quartiles")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      sb.append(s"==== $n ====\n")
      sb.append(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    Files.writeString(Paths.get(args.headOption.getOrElse("/tmp/plans.txt")), sb.toString)
    spark.stop()
  }
}
