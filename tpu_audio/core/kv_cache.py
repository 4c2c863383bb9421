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

__all__ = ["KVCache", "QuantKVCache", "init_cache", "init_quant_cache",
           "update_cache", "attention_mask"]


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


class QuantKVCache(NamedTuple):
    """int8 per-head-group affine KV cache: halves the HBM bytes read per
    decode step vs bf16 (the usual decode bottleneck). ``k_q/v_q``:
    int8 [L, B, H_kv, S_max, D]; ``k_scale/v_scale``:
    [L, B, H_kv, S_max, D/g]. Group size is implied by the shapes."""

    k_q: jnp.ndarray
    k_scale: jnp.ndarray
    v_q: jnp.ndarray
    v_scale: jnp.ndarray
    offset: jnp.ndarray
    valid_from: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k_q.shape[3]

    @property
    def group_size(self) -> int:
        return self.k_q.shape[-1] // self.k_scale.shape[-1]


def init_quant_cache(n_layers: int, batch: int, n_kv_heads: int,
                     head_dim: int, max_len: int, group_size: int = 64,
                     scale_dtype=jnp.float32, valid_from: int = 0
                     ) -> QuantKVCache:
    """Quantized variant of :func:`init_cache` (reference KV-quantization
    knobs, STT Generation.swift:14-19)."""
    group_size = min(group_size, head_dim)
    shape = (n_layers, batch, n_kv_heads, max_len, head_dim)
    s_shape = shape[:-1] + (head_dim // group_size,)
    return QuantKVCache(
        k_q=jnp.zeros(shape, jnp.int8),
        k_scale=jnp.zeros(s_shape, scale_dtype),
        v_q=jnp.zeros(shape, jnp.int8),
        v_scale=jnp.zeros(s_shape, scale_dtype),
        offset=jnp.zeros((), jnp.int32),
        valid_from=jnp.asarray(valid_from, jnp.int32),
    )


def _quantize(x, n_groups: int):
    """[B, H, T, D] -> (int8 codes, per-group scales [B, H, T, G])."""
    b, h, t, d = x.shape
    grouped = x.astype(jnp.float32).reshape(b, h, t, n_groups, d // n_groups)
    scale = jnp.maximum(jnp.abs(grouped).max(-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(grouped / scale[..., None]), -127, 127)
    return q.reshape(b, h, t, d).astype(jnp.int8), scale


def _dequantize(q, scale, dtype):
    l_or_b = q.shape[:-1]
    g = scale.shape[-1]
    grouped = q.astype(jnp.float32).reshape(*l_or_b, g, q.shape[-1] // g)
    return (grouped * scale[..., None].astype(jnp.float32)).reshape(
        q.shape).astype(dtype)


def update_cache(cache, layer: int, k_new: jnp.ndarray,
                 v_new: jnp.ndarray):
    """Write ``k_new/v_new [B, H, T, D]`` at the current offset of ``layer``.

    Returns the updated cache plus full-capacity K/V views for attention
    (mask out positions >= offset+T with :func:`attention_mask`). The offset
    is advanced by the *caller* once per step (after all layers) via
    ``cache._replace(offset=cache.offset + T)``. Accepts either a
    :class:`KVCache` or a :class:`QuantKVCache` (int8 storage, dequantized
    views returned in the incoming dtype).
    """
    if isinstance(cache, QuantKVCache):
        g = cache.k_scale.shape[-1]
        k_q, k_s = _quantize(k_new, g)
        v_q, v_s = _quantize(v_new, g)
        start = (layer, 0, 0, cache.offset, 0)
        new = cache._replace(
            k_q=jax.lax.dynamic_update_slice(cache.k_q, k_q[None], start),
            k_scale=jax.lax.dynamic_update_slice(
                cache.k_scale, k_s[None].astype(cache.k_scale.dtype), start),
            v_q=jax.lax.dynamic_update_slice(cache.v_q, v_q[None], start),
            v_scale=jax.lax.dynamic_update_slice(
                cache.v_scale, v_s[None].astype(cache.v_scale.dtype), start),
        )
        k = _dequantize(new.k_q[layer], new.k_scale[layer], k_new.dtype)
        v = _dequantize(new.v_q[layer], new.v_scale[layer], v_new.dtype)
        return new, k, v
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
