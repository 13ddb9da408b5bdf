"""Generate the bundled OuteTTS default speaker profile.

The reference ships default_speaker.json as a package resource
(/root/reference/Package.swift:42) so OuteTTS speaks with a consistent
voice out of the box. A profile contains word-level DAC codes of real
reference audio, so it can only be produced where the DAC + Whisper
weights (and a reference clip) are available — run this once on a
networked machine; tools/validate_release.py invokes it as part of the
launch-day checklist.

    python tools/make_default_speaker.py [--audio clip.wav]
        [--transcript "..."] [--out tpu_audio/models/outetts/default_speaker.json]

Without --audio it downloads the LJ-Speech clip the reference test suite
uses (Tests/TestAudioCache.swift:12-67).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

LJ_URL = ("https://keithito.com/LJ-Speech-Dataset/LJ037-0171.wav")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", default=None, help="reference wav (any rate)")
    ap.add_argument("--transcript", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-seconds", type=float, default=10.0)
    args = ap.parse_args()

    from tpu_audio.models.outetts.engine import (DEFAULT_SPEAKER_PATH,
                                                 OuteTTSEngine)
    from tpu_audio.utils.audio_io import load_audio

    if args.audio is None:
        import urllib.request

        args.audio = "/tmp/default_speaker_src.wav"
        print(f"downloading {LJ_URL} ...")
        urllib.request.urlretrieve(LJ_URL, args.audio)

    samples, rate = load_audio(args.audio)
    samples = samples[: int(args.max_seconds * rate)]

    eng = OuteTTSEngine(speaker=None)
    eng.load()
    profile = eng.create_speaker(samples, rate, transcript=args.transcript)
    out = args.out or DEFAULT_SPEAKER_PATH
    profile.save(out)
    print(f"wrote {out}: {len(profile.words)} words, "
          f"text={profile.text[:60]!r}")


if __name__ == "__main__":
    main()
