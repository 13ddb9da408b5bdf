"""Text tokenizer loading for the LLM-based engines.

Replaces swift-transformers' PreTrainedTokenizer: uses the HF `tokenizers`
runtime on tokenizer.json when present in the model directory, with a
deterministic byte-level fallback so engines run without checkpoint files
(tests, random-weight benches).
"""

from __future__ import annotations

import os


class ByteFallbackTokenizer:
    """Maps UTF-8 bytes to ids 0..255. Not a real BPE — a stand-in that
    keeps prompt construction functional without vocab files."""

    vocab_size = 256

    def encode(self, text: str) -> list[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids) -> str:
        return bytes(int(i) % 256 for i in ids).decode("utf-8", "replace")

    decode_raw = decode


class HFTokenizer:
    def __init__(self, path: str):
        from tokenizers import Tokenizer

        self._tok = Tokenizer.from_file(path)
        self.vocab_size = self._tok.get_vocab_size()

    def encode(self, text: str) -> list[int]:
        return self._tok.encode(text, add_special_tokens=False).ids

    def decode(self, ids) -> str:
        return self._tok.decode(list(map(int, ids)), skip_special_tokens=True)

    def decode_raw(self, ids) -> str:
        """Decode KEEPING special tokens (needed to extract <|c1_N|>-style
        audio-code tokens from generated streams)."""
        return self._tok.decode(list(map(int, ids)), skip_special_tokens=False)


def load_tokenizer(model_dir: str | None):
    if model_dir:
        p = os.path.join(model_dir, "tokenizer.json")
        if os.path.exists(p):
            return HFTokenizer(p)
    return ByteFallbackTokenizer()
