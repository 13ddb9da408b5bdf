"""STT demo CLI: transcribe or translate a wav file.

    python examples/stt_demo.py clip.wav --engine whisper --model tiny \
        --word-timestamps
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from examples.engine_manager import STT_ENGINES, EngineManager


def run_mic(engine, args) -> None:
    """Live microphone → streaming transcription: capture ~utterance-sized
    windows and transcribe each as it completes (Ctrl-C to stop). Mirrors
    the reference STT App's AudioRecorder flow (examples/STT App/)."""
    from tpu_audio.utils.recorder import AudioRecorder

    rec = AudioRecorder(target_rate=engine.sample_rate)
    window = args.mic_window
    print(f"listening (windows of {window:.1f}s; Ctrl-C to stop)...")
    try:
        for _ in rec.record_stream(chunk_seconds=0.25):
            chunk = rec.pull(window)
            if chunk is None:
                continue
            result = engine.transcribe(chunk, **(
                {"language": args.language} if args.language else {}))
            if result.text.strip():
                print(result.text.strip(), flush=True)
    except KeyboardInterrupt:
        tail = rec.drain()
        if len(tail) > engine.sample_rate // 2:
            result = engine.transcribe(tail)
            if result.text.strip():
                print(result.text.strip(), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", nargs="?", default=None,
                    help="wav file (omit with --mic)")
    ap.add_argument("--engine", default="whisper", choices=sorted(STT_ENGINES))
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--task", default="transcribe",
                    choices=["transcribe", "translate"])
    ap.add_argument("--language", default=None)
    ap.add_argument("--word-timestamps", action="store_true")
    ap.add_argument("--mic", action="store_true",
                    help="transcribe live from the default input device")
    ap.add_argument("--mic-window", type=float, default=5.0,
                    help="seconds of audio per transcribed window")
    args = ap.parse_args()
    if args.audio is None and not args.mic:
        ap.error("provide an audio file or --mic")

    mgr = EngineManager()
    engine = (mgr.stt("whisper", model=args.model) if args.engine == "whisper"
              else mgr.stt("funasr"))
    engine.load()

    if args.mic:
        engine.warmup()  # compile before audio starts flowing
        run_mic(engine, args)
        return

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
