"""Streaming duplex demo (BASELINE config #5): Marvis streaming TTS feeding
Fun-ASR streaming transcription, chunked end-to-end.

    python examples/duplex_demo.py --text "The quick brown fox." [--tiny]

--tiny runs randomly initialized miniature models (no downloads), proving
the chunked duplex plumbing end-to-end; without it the real checkpoints
are pulled from the hub.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_tiny():
    import jax

    from tpu_audio.api.stt_funasr import FunASREngine
    from tpu_audio.codecs import mimi
    from tpu_audio.models.funasr import model as fmodel
    from tpu_audio.models.marvis import model as mmodel
    from tpu_audio.models.marvis.engine import MarvisEngine
    from tpu_audio.nn import transformer

    mimi_cfg = mimi.MimiConfig(dimension=32, n_filters=4, ratios=(4, 3, 2),
                               t_layers=2, t_heads=4, t_ff=64, n_q=4,
                               bins=16, q_dim=8)
    marvis_cfg = mmodel.MarvisConfig(
        backbone=transformer.TransformerConfig(dim=32, n_layers=2, n_heads=4,
                                               n_kv_heads=2, hidden_dim=64),
        decoder=transformer.TransformerConfig(dim=16, n_layers=1, n_heads=2,
                                              n_kv_heads=2, hidden_dim=32),
        text_vocab_size=300, audio_vocab_size=32, n_codebooks=4)
    tts = MarvisEngine.from_params(
        mmodel.init_params(jax.random.PRNGKey(0), marvis_cfg), marvis_cfg,
        mimi.init_params(jax.random.PRNGKey(1), mimi_cfg), mimi_cfg,
        max_frames=12)
    tts.quality = "low"

    fcfg = fmodel.FunASRConfig(
        encoder=fmodel.SenseVoiceConfig(input_dim=560, encoder_dim=32,
                                        num_heads=4, ffn_dim=64,
                                        num_encoders0=1, num_encoders=2,
                                        num_tp_encoders=1, kernel_size=5),
        adaptor=fmodel.AdaptorConfig(encoder_dim=32, downsample_rate=2,
                                     ffn_dim=64, llm_dim=48, n_layer=1,
                                     attention_heads=4),
        llm=transformer.TransformerConfig(dim=48, n_layers=2, n_heads=4,
                                          n_kv_heads=2, hidden_dim=96,
                                          vocab_size=300, qk_norm=True,
                                          tie_word_embeddings=True))
    stt = FunASREngine.from_params(
        fmodel.init_params(jax.random.PRNGKey(2), fcfg), fcfg, max_cache=768)
    return tts, stt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--text", default="Streaming duplex test sentence.")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    if args.tiny:
        tts, stt = build_tiny()
    else:
        from tpu_audio import STT, TTS

        tts, stt = TTS.marvis(), STT.fun_asr()

    from tpu_audio.ops.resample import resample

    t0 = time.perf_counter()
    first_audio = None
    pieces = []
    for chunk in tts.generate_streaming(args.text):
        if first_audio is None and len(chunk.samples):
            first_audio = time.perf_counter() - t0
            print(f"[tts ] first audio after {first_audio * 1e3:.0f} ms")
        if len(chunk.samples):
            pieces.append(chunk.samples)
            print(f"[tts ] chunk: {len(chunk.samples) / 24000 * 1e3:.0f} ms "
                  f"of audio")
            # feed each chunk straight into streaming ASR (16 kHz)
            seg16 = resample(chunk.samples, 24000, 16000)
            if len(seg16) >= 1600:
                for text in stt.transcribe_streaming(seg16,
                                                     max_new_tokens=8):
                    print(f"[asr ] {text!r}")
    total = np.concatenate(pieces) if pieces else np.zeros(0)
    print(f"[done] {len(total) / 24000:.2f}s audio in "
          f"{time.perf_counter() - t0:.2f}s wall")


if __name__ == "__main__":
    main()
