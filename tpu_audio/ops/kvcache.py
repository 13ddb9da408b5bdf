"""Static-shape KV caches for XLA.

The reference grows MLX KVCacheSimple buffers dynamically (package/STT/
FunASR/FunASRSTT.swift:121); under XLA every shape must be static, so the
cache is a preallocated ring of (layers, batch, max_len, kv_heads, head_dim)
with a scalar write position. Updates are dynamic_update_slice, which XLA
performs in place when the buffer is donated/carried through lax.scan.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class KVCache:
    k: jax.Array  # (L, B, S_max, H_kv, D)
    v: jax.Array
    pos: jax.Array  # int32 scalar: number of valid positions

    @staticmethod
    def create(layers: int, batch: int, max_len: int, kv_heads: int,
               head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (layers, batch, max_len, kv_heads, head_dim)
        return KVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            pos=jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def update_layer(self, layer_k: jax.Array, layer_v: jax.Array,
                     layer_idx, new_k: jax.Array, new_v: jax.Array):
        """Write new (B, T, H, D) keys/values at self.pos for one layer.

        Used inside scan-over-layers bodies where per-layer slices live in
        the carry; returns the updated full (L, ...) buffers.
        """
        del layer_k, layer_v  # slices are re-derived from the full buffers
        k = jax.lax.dynamic_update_slice(
            self.k, new_k[None].astype(self.k.dtype),
            (layer_idx, 0, self.pos, 0, 0))
        v = jax.lax.dynamic_update_slice(
            self.v, new_v[None].astype(self.v.dtype),
            (layer_idx, 0, self.pos, 0, 0))
        return k, v

    def advanced(self, t: int) -> "KVCache":
        return KVCache(k=self.k, v=self.v, pos=self.pos + t)


@jax.tree_util.register_dataclass
@dataclass
class FusedKVCache:
    """KV cache in the whole-stack fused decode kernel's layout
    (ops/pallas/fused_step.py): (L, H_kv, S_max, D) with B=1 implicit.
    Left-pad prompt masking rides `start` (first valid slot) instead of an
    additive mask. forward_hidden dispatches on this type: prefill (T>1)
    runs the XLA scan path through layout transposes; single-token decode
    steps run as ONE Pallas launch for the entire layer stack."""

    k: jax.Array  # (L, H_kv, S_max, D)
    v: jax.Array
    pos: jax.Array  # int32 scalar
    start: jax.Array  # int32 scalar: first valid key slot

    @staticmethod
    def create(layers: int, max_len: int, kv_heads: int, head_dim: int,
               dtype=jnp.bfloat16, start=0) -> "FusedKVCache":
        shape = (layers, kv_heads, max_len, head_dim)
        return FusedKVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            pos=jnp.zeros((), jnp.int32),
            start=jnp.asarray(start, jnp.int32))

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def write(cache_k: jax.Array, cache_v: jax.Array, pos,
          new_k: jax.Array, new_v: jax.Array):
    """Functional single-layer write: (B, S, H, D) buffers, (B, T, H, D) new."""
    k = jax.lax.dynamic_update_slice(cache_k, new_k.astype(cache_k.dtype),
                                     (0, pos, 0, 0))
    v = jax.lax.dynamic_update_slice(cache_v, new_v.astype(cache_v.dtype),
                                     (0, pos, 0, 0))
    return k, v


@jax.tree_util.register_dataclass
@dataclass
class QuantizedKVCache:
    """int8 KV cache: per-token-per-head absmax scales, 2× less HBM than
    bf16 (the reference's optional QuantizedKVCache, package/TTS/Marvis/
    Models/MarvisModel.swift:384-389).  Reads dequantize into the attention
    dtype; the scale tensors are tiny ((…, 1) per head) so decode attention
    streams KV at int8 bandwidth."""

    k_q: jax.Array  # (L, B, S_max, H_kv, D) int8
    v_q: jax.Array
    k_s: jax.Array  # (L, B, S_max, H_kv, 1) f32 absmax/127 scales
    v_s: jax.Array
    pos: jax.Array  # int32 scalar

    @staticmethod
    def create(layers: int, batch: int, max_len: int, kv_heads: int,
               head_dim: int) -> "QuantizedKVCache":
        shape = (layers, batch, max_len, kv_heads, head_dim)
        sshape = (layers, batch, max_len, kv_heads, 1)
        return QuantizedKVCache(
            k_q=jnp.zeros(shape, jnp.int8), v_q=jnp.zeros(shape, jnp.int8),
            k_s=jnp.zeros(sshape, jnp.float32),
            v_s=jnp.zeros(sshape, jnp.float32),
            pos=jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k_q.shape[2]

    @staticmethod
    def _quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                    keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
        return q.astype(jnp.int8), s

    def update_layer(self, layer_idx, new_k: jax.Array, new_v: jax.Array):
        """Quantize + write new (B, T, H, D) keys/values at self.pos."""
        kq, ks = self._quantize(new_k)
        vq, vs = self._quantize(new_v)
        at = (layer_idx, 0, self.pos, 0, 0)
        return (jax.lax.dynamic_update_slice(self.k_q, kq[None], at),
                jax.lax.dynamic_update_slice(self.v_q, vq[None], at),
                jax.lax.dynamic_update_slice(self.k_s, ks[None], at),
                jax.lax.dynamic_update_slice(self.v_s, vs[None], at))

    def read_layer(self, layer_idx, dtype=jnp.bfloat16):
        """Dequantized (B, S_max, H, D) keys/values for one layer."""
        k = (self.k_q[layer_idx].astype(jnp.float32)
             * self.k_s[layer_idx]).astype(dtype)
        v = (self.v_q[layer_idx].astype(jnp.float32)
             * self.v_s[layer_idx]).astype(dtype)
        return k, v

    def advanced(self, t: int) -> "QuantizedKVCache":
        return QuantizedKVCache(k_q=self.k_q, v_q=self.v_q, k_s=self.k_s,
                                v_s=self.v_s, pos=self.pos + t)
