"""TTS demo CLI: synthesize text with any engine.

    python examples/tts_demo.py --engine kokoro --voice af_heart \
        --text "Hello world" --out out.wav
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from examples.engine_manager import TTS_ENGINES, EngineManager


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="kokoro", choices=sorted(TTS_ENGINES))
    ap.add_argument("--text", required=True)
    ap.add_argument("--out", default="tts_output.wav")
    ap.add_argument("--voice", default=None)
    ap.add_argument("--ref-audio", default=None,
                    help="reference wav for voice-cloning engines")
    args = ap.parse_args()

    mgr = EngineManager()
    kw = {}
    if args.voice and args.engine in ("kokoro", "orpheus"):
        kw["voice"] = args.voice
    engine = mgr.tts(args.engine, **kw)
    engine.load()

    if args.ref_audio and hasattr(engine, "prepare_conditionals"):
        from tpu_audio.utils.audio_io import read_wav

        ref, sr = read_wav(args.ref_audio)
        engine.prepare_conditionals(ref, sr)

    path = engine.save(args.text, args.out)
    print(f"wrote {path} "
          f"({engine.generation_time:.2f}s generation)")


if __name__ == "__main__":
    main()
