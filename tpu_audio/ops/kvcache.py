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


def write(cache_k: jax.Array, cache_v: jax.Array, pos,
          new_k: jax.Array, new_v: jax.Array):
    """Functional single-layer write: (B, S, H, D) buffers, (B, T, H, D) new."""
    k = jax.lax.dynamic_update_slice(cache_k, new_k.astype(cache_k.dtype),
                                     (0, pos, 0, 0))
    v = jax.lax.dynamic_update_slice(cache_v, new_v.astype(cache_v.dtype),
                                     (0, pos, 0, 0))
    return k, v
