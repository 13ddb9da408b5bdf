"""ALBERT text encoder (layer-shared BERT) for Kokoro.

Reference: package/TTS/Kokoro/Albert/*.swift + CustomAlbert.swift — one
transformer layer's weights applied num_hidden_layers times (the ALBERT
parameter-sharing trick), with a 128-d embedding factorized up to 768.
The repeated layer runs as a lax.fori_loop over the SAME params — the
layer-sharing maps perfectly onto XLA's loop representation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_audio.models.kokoro.config import AlbertConfig
from tpu_audio.nn import attention, layers


def init_params(key, cfg: AlbertConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 12)
    e, h = cfg.embedding_size, cfg.hidden_size
    return {
        "embeddings": {
            "word_embeddings": layers.init_embedding(ks[0], cfg.vocab_size, e, dtype),
            "position_embeddings": layers.init_embedding(
                ks[1], cfg.max_position_embeddings, e, dtype),
            "token_type_embeddings": layers.init_embedding(
                ks[2], cfg.type_vocab_size, e, dtype),
            "LayerNorm": layers.init_norm(e, dtype=dtype),
        },
        "encoder": {
            "embedding_hidden_mapping_in": layers.init_linear(ks[3], e, h, True, dtype),
            "albert_layer_groups": {"0": {"albert_layers": {"0": {
                "attention": {
                    "query": layers.init_linear(ks[4], h, h, True, dtype),
                    "key": layers.init_linear(ks[5], h, h, True, dtype),
                    "value": layers.init_linear(ks[6], h, h, True, dtype),
                    "dense": layers.init_linear(ks[7], h, h, True, dtype),
                    "LayerNorm": layers.init_norm(h, dtype=dtype),
                },
                "ffn": layers.init_linear(ks[8], h, cfg.intermediate_size, True, dtype),
                "ffn_output": layers.init_linear(ks[9], cfg.intermediate_size, h, True, dtype),
                "full_layer_layer_norm": layers.init_norm(h, dtype=dtype),
            }}}},
        },
        "pooler": layers.init_linear(ks[10], h, h, True, dtype),
    }


def forward(p: dict, cfg: AlbertConfig, ids: jax.Array,
            attn_mask: jax.Array) -> jax.Array:
    """ids (B, T), attn_mask (B, T) 1=valid → sequence output (B, T, hidden)."""
    emb = p["embeddings"]
    b, t = ids.shape
    x = layers.embedding(emb["word_embeddings"], ids)
    x = x + emb["position_embeddings"]["weight"][None, :t]
    x = x + emb["token_type_embeddings"]["weight"][0][None, None]
    x = layers.layer_norm(emb["LayerNorm"], x, cfg.layer_norm_eps)

    x = layers.linear(p["encoder"]["embedding_hidden_mapping_in"], x)

    lp = p["encoder"]["albert_layer_groups"]["0"]["albert_layers"]["0"]
    heads = cfg.num_attention_heads
    hd = cfg.hidden_size // heads
    add_mask = jnp.where(attn_mask[:, None, None, :] > 0, 0.0,
                         attention.NEG_INF).astype(jnp.float32)

    def layer(x, _):
        q = layers.linear(lp["attention"]["query"], x).reshape(b, t, heads, hd)
        k = layers.linear(lp["attention"]["key"], x).reshape(b, t, heads, hd)
        v = layers.linear(lp["attention"]["value"], x).reshape(b, t, heads, hd)
        o = attention.attend(q, k, v, add_mask)
        att = layers.linear(lp["attention"]["dense"], o.reshape(b, t, -1))
        x = layers.layer_norm(lp["attention"]["LayerNorm"], x + att,
                              cfg.layer_norm_eps)
        h = layers.gelu(layers.linear(lp["ffn"], x))
        h = layers.linear(lp["ffn_output"], h)
        x = layers.layer_norm(lp["full_layer_layer_norm"], x + h,
                              cfg.layer_norm_eps)
        return x, None

    x, _ = jax.lax.scan(layer, x, None, length=cfg.num_hidden_layers)
    return x
