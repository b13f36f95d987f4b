#!/usr/bin/env bash
# Full-surface robustness replay — the per-round gate that rules out two
# silent result-dependence classes the sf0.01 correctness run cannot see:
#
#   1. scale dependence  — every declared query re-verified against its
#      DuckDB oracle at sf0.1 (10x the gate's data, default partitions);
#   2. partition dependence — every query re-verified at 13 shuffle
#      partitions (odd, non-power-of-two, != the 32 the queries were
#      written under) — the cheap local stand-in for "a real cluster
#      repartitioned the data", which is where accidental reliance on
#      partition count or intra-partition order shows up;
#   3. degenerate inputs — every query re-verified at sf0.001 with 5
#      shuffle partitions: tiny tables, empty shuffle partitions,
#      single-row groups, LIMITs larger than their input — the edge-case
#      class the two scale legs never exercise.
#
# Usage: scripts/replay.sh <round-number>
# Writes REPLAY_r{N}.json at the repo root (one line per replay leg with
# the check.py verdict — written even when a leg FAILS, so the artifact
# records the red state), prints both verdicts, and exits non-zero if any
# leg mismatches. Full check.py output (incl. per-query FAIL diffs) lands
# in <workdir>.check. Runs sbt twice, SEQUENTIALLY (concurrent sbt
# invocations contend on the project lock).
set -uo pipefail
ROUND="${1:?usage: replay.sh <round-number>}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

leg() { # name sfdir partitions workdir -> prints "N/M queries match" or FAIL note
  local name="$1" sf="$2" parts="$3" dir="$4"
  rm -rf "$dir"
  echo "[replay] $name: full Verify over $sf at $parts shuffle partitions" >&2
  if ! SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTITIONS="$parts" \
      sbt -batch "runMain graft.Verify $sf $dir" >"$dir.log" 2>&1; then
    echo "VERIFY FAILED (see $dir.log)"
    return 1
  fi
  # keep the FULL check output (per-query FAIL diffs) in $dir.check and
  # surface it on stderr on mismatch — a swallowed diff costs a re-run
  python3 scripts/check.py "$dir" "$sf" >"$dir.check" 2>&1
  local rc=$?
  tail -1 "$dir.check"
  if [ $rc -ne 0 ]; then
    echo "[replay] $name MISMATCH — check output:" >&2
    cat "$dir.check" >&2
    return 1
  fi
}

STATUS=0
R1="$(leg sf0.1_default /root/testdata/sf0.1 32 /tmp/replay_sf01)" || STATUS=1
R2="$(leg sf0.01_p13 /root/testdata/sf0.01 13 /tmp/replay_p13)" || STATUS=1
# leg 3: tiny data + few partitions — the degenerate-input leg (empty
# shuffle partitions, single-row groups, LIMITs larger than their input)
# that neither scale leg exercises
R3="$(leg sf0.001_p5 /root/testdata/sf0.001 5 /tmp/replay_sf0001)" || STATUS=1
echo "[replay] sf0.1 @32 partitions: $R1" >&2
echo "[replay] sf0.01 @13 partitions: $R2" >&2
echo "[replay] sf0.001 @5 partitions: $R3" >&2

# python writes the artifact: leg results are captured command output
# (check.py verdicts, or an sbt failure note on a red leg) and must be
# JSON-ESCAPED — a shell heredoc would emit malformed JSON exactly in
# the failure case the artifact exists to record
ROUND="$ROUND" R1="$R1" R2="$R2" R3="$R3" python3 - <<'EOF'
import json, os, datetime
legs = [
    {"name": "sf0.1_default_partitions", "sf": "/root/testdata/sf0.1",
     "shuffle_partitions": 32, "result": os.environ["R1"]},
    {"name": "sf0.01_13_partitions", "sf": "/root/testdata/sf0.01",
     "shuffle_partitions": 13, "result": os.environ["R2"]},
    {"name": "sf0.001_5_partitions", "sf": "/root/testdata/sf0.001",
     "shuffle_partitions": 5, "result": os.environ["R3"]},
]
out = {"round": int(os.environ["ROUND"]),
       "date": datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d"),
       "legs": legs}
with open(f"REPLAY_r{os.environ['ROUND']}.json", "w") as f:
    json.dump(out, f, indent=1)
    f.write("\n")
EOF
echo "[replay] wrote REPLAY_r${ROUND}.json (status $STATUS)" >&2
exit $STATUS
