#!/bin/bash
# Round-5 delta measurements, run AFTER tools/measure_round4.sh with an
# otherwise idle host (the ablation's dispatch-bound rows are sensitive to
# host CPU contention):
#
#   bash tools/measure_round5.sh [outdir]
#
#   1. fused_ablation      — clean re-run (the round-5 sweep's pass ran
#                            concurrently with CPU test jobs)
#   2. ttfa_cv2_spec       — NEW: speculative decoding composed with
#                            token-granularity streaming (VERDICT r4 #3)
#   3. engines_funasr      — FunASR engine RTF after the depthwise-shifted
#                            FSMN lowering (VERDICT r4 #8)

set -u
OUT=${1:-/tmp/round5_delta}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
log() { echo "==== $* ====" | tee -a "$OUT/all.log"; }

run() {
    name=$1; shift
    log "$name: $*"
    timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -5
}

run fused_ablation python benchmarks/fused_ablation.py
run ttfa_cv2_spec python benchmarks/engines.py --engine cosyvoice2 --w8a8 \
    --ttfa --spec ngram
run engines_funasr python benchmarks/engines.py --engine funasr
run engines_funasr_w8a8 python benchmarks/engines.py --engine funasr --w8a8

log "done — transcribe $OUT/*.log into docs/BENCHMARKS.md"
