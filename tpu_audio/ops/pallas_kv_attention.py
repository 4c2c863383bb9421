"""Pallas TPU kernel: fused int8-KV decode attention.

The whisper-family AR decode reads the full cross-attention K/V
(32 layers x [20, 1500, 64] each) out of HBM on EVERY token — at
large-v3 shapes that is 491 MB/token, ~0.93 ms of the ~5 ms decode step
(measured on v5e). Storing the cross K/V as int8 halves that traffic,
but the XLA path (``kv_cache._dequantize`` then ``nn.sdpa``)
*materializes* the dequantized f32 K/V in HBM first, making int8 KV
2.3x SLOWER than bf16 (2.14 vs 0.93 ms/token measured). This kernel
fuses dequantize+attention in VMEM so the only HBM reads are the int8
codes and the per-position scales:

    measured on v5e, 32 layers x 224 tokens, [20, 1500, 64] cross-KV:
        bf16 XLA sdpa            0.926 ms/token
        int8 XLA dequant+sdpa    2.136 ms/token
        int8 this kernel         0.507 ms/token   (1.8x vs bf16, 4.2x vs XLA int8)

Layout: K/V are stored TRANSPOSED per head, ``[H, D, S]`` int8 codes
with ``[H, G, S]`` f32 scales/biases, S padded to a multiple of 128 so
the position axis rides the 128-wide lanes (D=64 < 128 would waste
half the lanes in the natural ``[S, D]`` layout). The kernel computes,
per block of heads: dequantize K tile -> q @ K [1, S] scores on the MXU
-> masked softmax in f32 on the VPU -> dequantize V tile -> V @ p.

Single-query (t=1 decode) only; the quantization scheme is exactly
``kv_cache._quantize(bits=8)`` (symmetric int8, per-position groups),
so codes are interchangeable with the XLA path. 4-bit packed KV stays
on the XLA path (the nibble packing crosses the transposed D axis).

Reference: the MLX build's quantized-KV option (Generation.swift:14-19)
with MLXFast scaledDotProductAttention; this is the TPU-native fused
equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.ops.pallas_mel import is_tpu
from tpu_audio.core.jitting import ajit

__all__ = ["quantize_kv_transposed", "decode_attention_int8", "is_tpu",
           "supported"]

_LANES = 128
# per-head VMEM bytes ~= codes (K+V) + f32 dequant (K+V); cap the head
# block so a step stays well under the 16 MB VMEM budget
_VMEM_BUDGET = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(n_heads: int, head_dim: int, bits: int | None) -> bool:
    """Kernel constraints: int8 codes, int8-tileable head_dim."""
    return bool(bits == 8 and head_dim % 32 == 0 and n_heads >= 1)


def quantize_kv_transposed(x, n_groups: int):
    """[H, S, D] float -> transposed int8 layout for the kernel:
    (codes [H, D, Sp] int8, scales [H, G, Sp] f32, biases [H, G, Sp] f32)
    with Sp = S rounded up to a lane multiple. Padding positions carry
    zero codes/scales and are masked by ``valid`` in the kernel."""
    from tpu_audio.core import kv_cache

    h, s, d = x.shape
    sp = _round_up(s, _LANES)
    codes, scales, biases = kv_cache._quantize(x, n_groups=n_groups, bits=8)
    codes = jnp.swapaxes(jnp.pad(codes, ((0, 0), (0, sp - s), (0, 0))), -1, -2)
    scales = jnp.swapaxes(
        jnp.pad(scales, ((0, 0), (0, sp - s), (0, 0))), -1, -2
    ).astype(jnp.float32)
    biases = jnp.swapaxes(
        jnp.pad(biases, ((0, 0), (0, sp - s), (0, 0))), -1, -2
    ).astype(jnp.float32)
    return codes, scales, biases


def _kernel(valid_ref, q_ref, kt_ref, ks_ref, kb_ref, vt_ref, vs_ref, vb_ref,
            o_ref, *, sm_scale: float, hb: int, g: int):
    valid = valid_ref[0]
    hd = q_ref.shape[-1]
    s = kt_ref.shape[-1]
    q = q_ref[:].astype(jnp.float32)                      # [HB, 1, HD]
    k = kt_ref[:].astype(jnp.float32)                     # [HB, HD, S]
    k = (k.reshape(hb, g, hd // g, s) * ks_ref[:][:, :, None, :]
         + kb_ref[:][:, :, None, :]).reshape(hb, hd, s)
    scores = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * sm_scale    # [HB, 1, S]
    pos = jax.lax.broadcasted_iota(jnp.int32, (hb, 1, s), 2)
    scores = jnp.where(pos < valid, scores, -1e9)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    v = vt_ref[:].astype(jnp.float32)
    v = (v.reshape(hb, g, hd // g, s) * vs_ref[:][:, :, None, :]
         + vb_ref[:][:, :, None, :]).reshape(hb, hd, s)
    o = jax.lax.dot_general(
        v, p, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [HB, HD, 1]
    o_ref[:] = (o / denom).transpose(0, 2, 1)


def _heads_block(n_heads: int, head_dim: int, s: int) -> int:
    per_head = head_dim * s * (1 + 4) * 2  # int8 codes + f32 dequant, K and V
    hb = 1
    for cand in range(1, n_heads + 1):
        if n_heads % cand == 0 and cand * per_head <= _VMEM_BUDGET:
            hb = cand
    return hb


@functools.partial(ajit, static_argnames=("sm_scale", "interpret"))
def decode_attention_int8(q, kt, ks, kb, vt, vs, vb, valid, *,
                          sm_scale: float, interpret: bool = False):
    """Single-token attention over transposed int8 K/V.

    q [H, 1, D] (any float dtype); kt/vt [H, D, Sp] int8;
    ks/kb/vs/vb [H, G, Sp] f32; valid [1] int32 (positions >= valid are
    masked). Returns [H, 1, D] f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_heads, _, hd = q.shape
    s = kt.shape[-1]
    g = ks.shape[1]
    hb = _heads_block(n_heads, hd, s)
    kern = functools.partial(_kernel, sm_scale=sm_scale, hb=hb, g=g)

    def hmap(h, v_):
        return (h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_heads // hb,),
        in_specs=[
            pl.BlockSpec((hb, 1, hd), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, hd, s), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, g, s), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, g, s), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, hd, s), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, g, s), hmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, g, s), hmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hb, 1, hd), hmap, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_heads, 1, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_heads * s * hd,
            transcendentals=n_heads * s,
            bytes_accessed=2 * n_heads * hd * s + 4 * 4 * n_heads * g * s),
        interpret=interpret,
    )(valid, q, kt, ks, kb, vt, vs, vb)


def reference_attention_int8(q, kt, ks, kb, vt, vs, vb, valid, sm_scale):
    """Pure-jnp reference for tests: same math, no Pallas."""
    qf = np.asarray(q, np.float32)
    h, _, hd = qf.shape
    g = ks.shape[1]
    s = kt.shape[-1]

    def deq(codes, sc, b):
        x = np.asarray(codes, np.float32).reshape(h, g, hd // g, s)
        return (x * np.asarray(sc)[:, :, None, :]
                + np.asarray(b)[:, :, None, :]).reshape(h, hd, s)

    k = deq(kt, ks, kb)
    v = deq(vt, vs, vb)
    scores = np.einsum("hqd,hds->hqs", qf, k) * sm_scale
    mask = np.arange(s)[None, None, :] < int(np.asarray(valid)[0])
    scores = np.where(mask, scores, -1e9)
    m = scores.max(-1, keepdims=True)
    p = np.exp(scores - m)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hqs,hds->hqd", p, v)
