#!/usr/bin/env bash
# Round-13 measurement battery — run at (near-)final HEAD, sequentially
# (one sbt at a time). Produces:
#   BENCH_LOCAL_r13.json        full surface at sf0.1, reps=3 medians
#   BENCH_LOCAL_r13_10x.json    heavy queries at /tmp/graft-scale/x10
#   SCALING.json refresh        10x block for the round-13 additions
# The JSON assembly/protocol fields are added by the committer; this
# script only runs the timed legs and tees raw outputs to /tmp/r13m/.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"; cd "$REPO"
mkdir -p /tmp/r13m

# r12's 30 heavies + the round-13 heavy additions (q_curation_stored:
# served funnel; q_events_cdc_apply + q_layout_bucketed ride the newly
# synthesized events/lineitem/orders copies)
TEN_X_QUERIES="q_dedup_jaccard,q_dedup_clusters,q_dedup_corpus,q_dedup_editdist,q_dedup_incremental,q_dedup_index_build,q_dedup_substring,q_dedup_substring_cut,q_dedup_substring_profile,q_text_decontam_spans,q_text_decontam_trim,q_text_bloom_decontam,q_text_contamination,q_text_classifier,q_text_fingerprint,q_curation_report,q_sample_dsir,q_sample_quality_budget,q_graph_pagerank,q_embed_mmr,q_text_bpe_apply,q_text_bpe_encode,q_text_bpe_batched,q_text_dup_ngrams,q_text_lm_smoothed,q_text_ppl_buckets,q_text_bpe_stats,q_text_lm_score,q_text_ppl_capped,q_text_bpe_decode,q_curation_stored,q_events_cdc_apply,q_layout_bucketed,q_shuffle_epoch,q_shard_token_balanced,q_multimodal_dedup"

case "${1:-all}" in
  bench)
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      sbt -batch "runMain graft.Bench" 2>/tmp/r13m/bench.err | grep '{"metric"' | sed 's/^\[info\] //' \
      > /tmp/r13m/bench.json
    ;;
  synth)  # make sure x1/x10 synthesis exists without timing queries
    SPARK_GRAFT_SCALE_ONLY=__none__ sbt -batch "runMain graft.ScaleCheck" 2>&1 | tail -3
    ;;
  bench10x)
    SPARK_GRAFT_SF_DIR=/tmp/graft-scale/x10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      SPARK_GRAFT_ONLY="$TEN_X_QUERIES" \
      sbt -batch "runMain graft.Bench" 2>/tmp/r13m/bench10x.err | grep '{"metric"' | sed 's/^\[info\] //' \
      > /tmp/r13m/bench10x.json
    # the same set at 1x for the cost ratio
    SPARK_GRAFT_SF_DIR=/tmp/graft-scale/x1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
      SPARK_GRAFT_ONLY="$TEN_X_QUERIES" \
      sbt -batch "runMain graft.Bench" 2>/tmp/r13m/bench1x.err | grep '{"metric"' | sed 's/^\[info\] //' \
      > /tmp/r13m/bench1x.json
    ;;
  scaling10)
    # only the round-13 additions — the carried sections keep their
    # round-12 measured_at_round tags
    SPARK_GRAFT_SCALE_ONLY="q_shuffle_epoch,q_shard_token_balanced,q_multimodal_dedup,q_events_cdc_apply,q_layout_bucketed" \
      sbt -batch "runMain graft.ScaleCheck" 2>/tmp/r13m/scaling10.err \
      | grep '{"copies"' | sed 's/^\[info\] //' > /tmp/r13m/scaling10.json
    ;;
  scaling100)
    SPARK_GRAFT_SCALE_COPIES=100 \
      SPARK_GRAFT_SCALE_ONLY="q_shuffle_epoch,q_shard_token_balanced,q_multimodal_dedup,q_events_cdc_apply,q_layout_bucketed,q_curation_stored" \
      sbt -batch "runMain graft.ScaleCheck" 2>/tmp/r13m/scaling100.err \
      | grep '{"copies"' | sed 's/^\[info\] //' > /tmp/r13m/scaling100.json
    ;;
  *) echo "usage: $0 {bench|synth|bench10x|scaling10|scaling100}"; exit 2;;
esac
