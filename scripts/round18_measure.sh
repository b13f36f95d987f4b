#!/usr/bin/env bash
# Round-18 measurement battery (optimization round): same legs as r16 —
# full-surface bench at sf0.1, heavy-set 10x + same-day 1x canary on the
# synthesized scale trees. Run sequentially (one sbt at a time); outputs
# under /tmp/r18m/, assembled into BENCH_LOCAL_r18_final.json /
# BENCH_LOCAL_r18_10x.json by the committer.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"; cd "$REPO"
mkdir -p /tmp/r18m

# identical heavy set to round16_measure.sh so 10x/1x ratios stay
# comparable across rounds
TEN_X_QUERIES="q_dedup_jaccard,q_dedup_clusters,q_dedup_corpus,q_dedup_editdist,q_dedup_incremental,q_dedup_index_build,q_dedup_substring,q_dedup_substring_cut,q_dedup_substring_profile,q_text_decontam_spans,q_text_decontam_trim,q_text_bloom_decontam,q_text_contamination,q_text_classifier,q_text_fingerprint,q_curation_report,q_sample_dsir,q_sample_quality_budget,q_graph_pagerank,q_embed_mmr,q_text_bpe_apply,q_text_bpe_encode,q_text_bpe_batched,q_text_dup_ngrams,q_text_lm_smoothed,q_text_ppl_buckets,q_text_bpe_stats,q_text_lm_score,q_text_ppl_capped,q_text_bpe_decode,q_curation_stored,q_events_cdc_apply,q_layout_bucketed,q_shuffle_epoch,q_shard_token_balanced,q_multimodal_dedup,q_text_pmi,q_text_lm_kneser,q_text_lm_kneser_served,q_sample_curriculum_stored,q_shard_stored,q_events_cdc_snapshot,q_graph_triangles,q_text_bm25_stored,q_dedup_index_append,q_text_bm25_append,q_text_decontam_stored,q_dedup_index_maint,q_text_bm25_maint,q_text_decontam_maint,q_embed_ann_maint,q_dedup_cluster_stats,q_pipeline_stored,q_pipeline_maint,q_pipeline_refresh,q_text_classifier_refresh,q_sample_dsir_refresh,q_embed_ann_retrain"

case "${1:-all}" in
  bench)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      SPARK_GRAFT_BENCH_OUT=/tmp/r18m/bench.json \
      sbt -batch "runMain graft.Bench" > /tmp/r18m/bench.out 2>/tmp/r18m/bench.err
    ;;
  synth)  # make sure x1/x10 synthesis exists without timing queries
    SPARK_GRAFT_SCALE_ONLY=__none__ sbt -batch "runMain graft.ScaleCheck" 2>&1 | tail -3
    ;;
  bench10x)
    SPARK_GRAFT_SF_DIR=/tmp/graft-scale/x10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      SPARK_GRAFT_ONLY="$TEN_X_QUERIES" \
      SPARK_GRAFT_BENCH_OUT=/tmp/r18m/bench10x.json \
      sbt -batch "runMain graft.Bench" > /tmp/r18m/bench10x.out 2>/tmp/r18m/bench10x.err
    SPARK_GRAFT_SF_DIR=/tmp/graft-scale/x1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      SPARK_GRAFT_ONLY="$TEN_X_QUERIES" \
      SPARK_GRAFT_BENCH_OUT=/tmp/r18m/bench1x.json \
      sbt -batch "runMain graft.Bench" > /tmp/r18m/bench1x.out 2>/tmp/r18m/bench1x.err
    ;;
  *) echo "usage: $0 {bench|synth|bench10x}"; exit 2;;
esac
