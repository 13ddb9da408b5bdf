#!/bin/bash
# One-command measurement sweep for the round-3 additions (run on a machine
# with the real TPU chip reachable; see docs/BENCHMARKS.md "Measurement
# status"). Writes everything to a timestamped log for transcription into
# docs/BENCHMARKS.md.
#
#   bash tools/measure_round3.sh [outdir]
#
# Covers, in dependency order:
#   1. tunnel canary + gemm ceiling (harness sanity)
#   2. bench.py           — whisper headline combos incl. the new
#                           single-stream w8a8 (fused decoder) row
#   3. enc_profile        — pair-packed attention row + MLP-gap ablations
#   4. dec_profile        — int8 whisper decoder step row
#   5. fused_ablation     — fused-vs-plain for CV2/FunASR/1B/3B LM steps,
#                           whisper single-stream step, marvis 3 modes
#   6. llm_decode --spec  — speculative ms_iter with the fused draft chain
#   7. engines --engine marvis / cosyvoice2 ; cv3_streaming — engine RTF
#
# Every fused path is probe-gated with the XLA fallback, so a FAILED row
# means the fallback served it — note it and file the Mosaic error.

set -u
OUT=${1:-/tmp/round3_measurements}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
log() { echo "==== $* ====" | tee -a "$OUT/all.log"; }

run() {
    name=$1; shift
    log "$name: $*"
    timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -30
}

run canary python benchmarks/gemm_ceiling.py
run bench python bench.py
run enc_profile python benchmarks/enc_profile.py
run dec_profile python benchmarks/dec_profile.py
run fused_ablation python benchmarks/fused_ablation.py
run llm_spec_ngram python benchmarks/llm_decode.py --w8a8 --spec ngram
run llm_spec_1b python benchmarks/llm_decode.py --w8a8 --spec 1b
run engines_marvis python benchmarks/engines.py --engine marvis
run engines_cv2 python benchmarks/engines.py --engine cosyvoice2 --w8a8
run cv3_streaming python benchmarks/cv3_streaming.py

log "done — transcribe $OUT/*.log into docs/BENCHMARKS.md; if a fused row"
log "regressed, flip its TPU_AUDIO_FUSED_* default and re-measure"
