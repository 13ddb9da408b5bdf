"""Batch serving demo: many clips / many texts through one compiled loop.

Throughput mode for offline workloads — the decode weights stream from HBM
once per step for the whole batch, so aggregate throughput scales ~7x at
batch 8 on the 3B TTS model and ~2.2x for Whisper windows (bench.py).

    # transcribe a directory of wavs in batches of 8
    python examples/batch_serving.py stt --model large-v3-turbo *.wav

    # synthesize several texts as one batched decode
    python examples/batch_serving.py tts --voice tara \
        "First sentence." "Second one." "And a third."
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def run_stt(args) -> None:
    from tpu_audio import STT

    eng = STT.whisper(model=args.model, quantization=args.quantization)
    t0 = time.perf_counter()
    texts = eng.transcribe_batch(args.inputs, batch_size=args.batch_size,
                                 language=args.language)
    dt = time.perf_counter() - t0
    for path, text in zip(args.inputs, texts):
        print(f"{path}: {text}")
    print(f"\n{len(texts)} clips in {dt:.2f}s "
          f"(batch_size={args.batch_size})", file=sys.stderr)


def run_tts(args) -> None:
    from tpu_audio import TTS
    from tpu_audio.utils.audio_io import write_wav

    eng = TTS.orpheus(voice=args.voice)
    results = eng.generate_batch(args.inputs)
    total_audio = sum(r.duration for r in results)
    for i, r in enumerate(results):
        out = f"batch_out_{i}.wav"
        write_wav(out, r.samples, r.sample_rate)
        print(f"{out}: {r.duration:.2f}s")
    print(f"\n{len(results)} texts, {total_audio:.1f}s audio in "
          f"{eng.generation_time:.2f}s "
          f"(aggregate RTF {eng.generation_time / max(total_audio, 1e-9):.3f})",
          file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    st = sub.add_parser("stt")
    st.add_argument("inputs", nargs="+", help="wav files")
    st.add_argument("--model", default="large-v3-turbo")
    st.add_argument("--quantization", default="fp16")
    st.add_argument("--language", default="en")
    st.add_argument("--batch-size", type=int, default=8)
    tt = sub.add_parser("tts")
    tt.add_argument("inputs", nargs="+", help="texts to synthesize")
    tt.add_argument("--voice", default="tara")
    args = ap.parse_args()
    (run_stt if args.mode == "stt" else run_tts)(args)


if __name__ == "__main__":
    main()
