"""STT demo CLI: transcribe or translate a wav file.

    python examples/stt_demo.py clip.wav --engine whisper --model tiny \
        --word-timestamps
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from examples.engine_manager import STT_ENGINES, EngineManager


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("--engine", default="whisper", choices=sorted(STT_ENGINES))
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--task", default="transcribe",
                    choices=["transcribe", "translate"])
    ap.add_argument("--language", default=None)
    ap.add_argument("--word-timestamps", action="store_true")
    args = ap.parse_args()

    mgr = EngineManager()
    engine = (mgr.stt("whisper", model=args.model) if args.engine == "whisper"
              else mgr.stt("funasr"))
    engine.load()

    fn = engine.translate if args.task == "translate" else engine.transcribe
    kw = {"language": args.language}
    if args.engine == "whisper" and args.word_timestamps:
        kw["word_timestamps"] = True
    result = fn(args.audio, **{k: v for k, v in kw.items() if v is not None})

    print(result.text)
    for seg in result.segments:
        print(f"  [{seg.start:7.2f} → {seg.end:7.2f}] {seg.text}")
        for w in seg.words or []:
            print(f"      {w.start:7.2f}–{w.end:7.2f} {w.word!r} "
                  f"p={w.probability:.2f}")
    print(f"(RTF {result.rtf:.3f}, {1 / max(result.rtf, 1e-9):.1f}x real time)")


if __name__ == "__main__":
    main()
