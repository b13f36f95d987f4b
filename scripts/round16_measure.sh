#!/usr/bin/env bash
# Round-16 measurement battery — run at (near-)final HEAD, sequentially
# (one sbt at a time). Produces raw outputs under /tmp/r16m/ which the
# committer assembles into:
#   BENCH_LOCAL_r16.json        full surface at sf0.1, reps=3 medians
#   BENCH_LOCAL_r16_10x.json    heavy queries at /tmp/graft-scale/x10
#                               (+ the same-day 1x canary leg)
#   SCALING.json refresh        10x/100x blocks for the round-16 additions
#   RECALL.json                 regenerated with the retrain block
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"; cd "$REPO"
mkdir -p /tmp/r16m

# r15's heavy set + the round-16 additions (retrain/maint/refresh ride
# memoized artifact builds; first rep prices the build honestly)
TEN_X_QUERIES="q_dedup_jaccard,q_dedup_clusters,q_dedup_corpus,q_dedup_editdist,q_dedup_incremental,q_dedup_index_build,q_dedup_substring,q_dedup_substring_cut,q_dedup_substring_profile,q_text_decontam_spans,q_text_decontam_trim,q_text_bloom_decontam,q_text_contamination,q_text_classifier,q_text_fingerprint,q_curation_report,q_sample_dsir,q_sample_quality_budget,q_graph_pagerank,q_embed_mmr,q_text_bpe_apply,q_text_bpe_encode,q_text_bpe_batched,q_text_dup_ngrams,q_text_lm_smoothed,q_text_ppl_buckets,q_text_bpe_stats,q_text_lm_score,q_text_ppl_capped,q_text_bpe_decode,q_curation_stored,q_events_cdc_apply,q_layout_bucketed,q_shuffle_epoch,q_shard_token_balanced,q_multimodal_dedup,q_text_pmi,q_text_lm_kneser,q_text_lm_kneser_served,q_sample_curriculum_stored,q_shard_stored,q_events_cdc_snapshot,q_graph_triangles,q_text_bm25_stored,q_dedup_index_append,q_text_bm25_append,q_text_decontam_stored,q_dedup_index_maint,q_text_bm25_maint,q_text_decontam_maint,q_embed_ann_maint,q_dedup_cluster_stats,q_pipeline_stored,q_pipeline_maint,q_pipeline_refresh,q_text_classifier_refresh,q_sample_dsir_refresh,q_embed_ann_retrain"

# the round-16 additions (carried sections keep their earlier
# measured_at_round tags)
R16_SCALE="q_pipeline_maint,q_pipeline_refresh,q_text_classifier_refresh,q_sample_dsir_refresh"

case "${1:-all}" in
  bench)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      sbt -batch "runMain graft.Bench" 2>/tmp/r16m/bench.err | grep '{"metric"' | sed 's/^\[info\] //' \
      > /tmp/r16m/bench.json
    ;;
  synth)  # make sure x1/x10 synthesis exists without timing queries
    SPARK_GRAFT_SCALE_ONLY=__none__ sbt -batch "runMain graft.ScaleCheck" 2>&1 | tail -3
    ;;
  bench10x)
    SPARK_GRAFT_SF_DIR=/tmp/graft-scale/x10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      SPARK_GRAFT_ONLY="$TEN_X_QUERIES" \
      sbt -batch "runMain graft.Bench" 2>/tmp/r16m/bench10x.err | grep '{"metric"' | sed 's/^\[info\] //' \
      > /tmp/r16m/bench10x.json
    # the same set at 1x for the cost ratio AND as the same-day host canary
    SPARK_GRAFT_SF_DIR=/tmp/graft-scale/x1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      SPARK_GRAFT_ONLY="$TEN_X_QUERIES" \
      sbt -batch "runMain graft.Bench" 2>/tmp/r16m/bench1x.err | grep '{"metric"' | sed 's/^\[info\] //' \
      > /tmp/r16m/bench1x.json
    ;;
  scaling10)
    SPARK_GRAFT_SCALE_ONLY="$R16_SCALE" \
      sbt -batch "runMain graft.ScaleCheck" 2>/tmp/r16m/scaling10.err \
      | grep '{"copies"' | sed 's/^\[info\] //' > /tmp/r16m/scaling10.json
    ;;
  scaling100)
    SPARK_GRAFT_SCALE_COPIES=100 \
      SPARK_GRAFT_SCALE_ONLY="$R16_SCALE" \
      sbt -batch "runMain graft.ScaleCheck" 2>/tmp/r16m/scaling100.err \
      | grep '{"copies"' | sed 's/^\[info\] //' > /tmp/r16m/scaling100.json
    ;;
  recall)
    sbt -batch "runMain graft.RecallCurve" 2>/tmp/r16m/recall.err \
      | grep '{"sf"' | tail -1 | sed 's/^\[info\] //' > /tmp/r16m/recall.json
    ;;
  *) echo "usage: $0 {bench|synth|bench10x|scaling10|scaling100|recall}"; exit 2;;
esac
