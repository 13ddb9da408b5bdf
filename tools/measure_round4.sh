#!/bin/bash
# Round-4 on-chip measurement sweep: everything VERDICT r3 flagged as
# implemented-but-unmeasured, plus the round-4 fused encoder blocks.
#
#   bash tools/measure_round4.sh [outdir]
#
# Order (cheapest sanity first, headline last):
#   1. canary              — harness sanity (gemm ceiling)
#   2. enc_profile         — fused encoder block rows (blocks_fe, FUSED w8a8)
#   3. fused_ablation      — fused-vs-plain LM/frame steps (CV2/FunASR/1B/3B,
#                            whisper single-stream, marvis 3 modes)
#   4. llm_decode --spec   — speculative ms_iter with fused draft chain
#   5. engines --ttfa      — p50/p90 TTFA across the LLM TTS engines
#   6. engines cosyvoice2 --spec ngram — engine-level speculative with
#                            measured accept rate
#   7. cv3_streaming       — TTFA + drift
#   8. bench.py            — headline whisper combos
#
# Every fused path is probe-gated with the XLA fallback, so a FAILED row
# means the fallback served it — note it and file the Mosaic error.

set -u
OUT=${1:-/tmp/round4_measurements}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
log() { echo "==== $* ====" | tee -a "$OUT/all.log"; }

run() {
    name=$1; shift
    log "$name: $*"
    timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -5
}

run canary python benchmarks/gemm_ceiling.py
run enc_profile python benchmarks/enc_profile.py
run fused_ablation python benchmarks/fused_ablation.py
run llm_spec_ngram python benchmarks/llm_decode.py --w8a8 --spec ngram
run llm_spec_1b python benchmarks/llm_decode.py --w8a8 --spec 1b
run ttfa_orpheus python benchmarks/engines.py --engine orpheus --w8a8 --ttfa
run ttfa_chatterbox python benchmarks/engines.py --engine chatterbox --ttfa
run ttfa_cbturbo python benchmarks/engines.py --engine chatterbox_turbo --ttfa
run ttfa_cv2 python benchmarks/engines.py --engine cosyvoice2 --w8a8 --ttfa
run ttfa_marvis python benchmarks/engines.py --engine marvis --ttfa
run engines_marvis python benchmarks/engines.py --engine marvis
run engines_cv2_spec python benchmarks/engines.py --engine cosyvoice2 --w8a8 --spec ngram
run cv3_streaming python benchmarks/cv3_streaming.py
run bench python bench.py

log "done — transcribe $OUT/*.log into docs/BENCHMARKS.md"
