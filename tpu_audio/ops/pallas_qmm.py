"""Pallas TPU kernel: fused MLX-quantized (4/8-bit grouped-affine) GEMV.

AR decode with quantized checkpoints is HBM-bound on weight reads. The
XLA lowering of :func:`tpu_audio.core.quant.quantized_matmul`
materializes the dequantized bf16 weight before the matmul (measured
slower than plain bf16 on whisper-large-v3 / v5e — the unpack writes
cost more than the packed reads save). This kernel keeps the packed
uint32 weight in HBM and dequantizes in VMEM.

Mosaic cannot shape-cast the unpack across lanes ([O, words, 8] ->
[O, I]), so the kernel works in **nibble planes**: plane ``n`` of the
packed words is exactly the weight columns ``{w*per_word + n}``, a 2-D
[O, words] array obtained with one shift+mask, and the kernel
accumulates ``per_word`` MXU dots against a plane-transposed input
(prepared outside — a free XLA reshape of a tiny [B, I] array).

The grouped affine is split: the scale rides inside the kernel as a
pre-expanded [O, words] array, and the bias term — which only needs
per-group input sums — is added outside as a tiny
``x_group_sums @ biases.T`` matmul.

The scale expansion has two modes:
- default: expanded to f32 inside this function per call. Fine for
  one-shot calls, but inside a scan-over-layers decode body the
  expansion re-materializes [O, words] f32 every step — 1 extra
  byte/weight of HBM traffic (write+read), eating most of the packed
  savings.
- ``scales_w``: the caller passes the expansion precomputed ONCE at
  load time as **bf16** [O, words] (`expand_word_scales`). Per output
  element the kernel then reads 0.5 B (packed) + 0.25 B (bf16 scales)
  vs 2 B for a bf16 weight: 2.7x less HBM. bf16 scales keep 8 total
  mantissa bits (vs fp16's 11 in MLX's scale tensors), adding ~0.2-0.4%
  scale rounding error — negligible against int4 quantization noise,
  but comparable to int8's, so for bits=8 prefer dense bf16 or w8a8
  over this packed path when fidelity matters.

Layout (MLX ``quantize()``, see core/quant.py): for W [O, I] —
``packed`` uint32 [O, I*bits/32] (32/bits consecutive input elements
per word, LSB first), ``scales``/``biases`` [O, I/group]:
``w[o, i] = scales[o, i//g] * q[o, i] + biases[o, i//g]``.

Opt-in via ``TPU_AUDIO_PALLAS=1`` like the mel kernel; correctness is
pinned by interpret-mode tests and verified on-device.

Measured on v5e (whisper-large-v3 decoder, 192 GEMVs/token): 4.67
ms/token vs 4.87 XLA-dequant vs 3.39 bf16 — per-`pallas_call` launch
overhead (~20 us on this backend) dominates decode-shaped invocations,
so the kernel only pays off for fewer/larger calls (batched serving,
fused multi-projection layers). It therefore stays opt-in; the honest
default for 4-bit checkpoints on TPU today is dequant-at-load to bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from tpu_audio.core.jitting import ajit

__all__ = ["quantized_matvec", "expand_word_scales"]


def expand_word_scales(scales: jnp.ndarray, group_size: int, bits: int,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """Precompute the per-word scale planes ([..., O, groups] ->
    [..., O, words]) once at load time; pass to :func:`quantized_matvec`
    as ``scales_w`` so decode loops never re-expand."""
    wpg = group_size // (32 // bits)
    return jnp.repeat(scales.astype(dtype), wpg, axis=-1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(bits: int):
    per_word = 32 // bits
    mask = (1 << bits) - 1

    def kernel(x_ref, packed_ref, scales_ref, out_ref):
        packed = packed_ref[:]  # [T_O, words] uint32
        scales_w = scales_ref[:].astype(jnp.float32)  # [T_O, words]
        acc = None
        for n in range(per_word):
            q = (packed >> (bits * n)) & mask
            q = jax.lax.bitcast_convert_type(q, jnp.int32).astype(
                jnp.float32)
            dot = jnp.dot(x_ref[n], (q * scales_w).T,
                          preferred_element_type=jnp.float32)
            acc = dot if acc is None else acc + dot
        out_ref[:] = acc

    return kernel


@functools.partial(ajit,
                   static_argnames=("group_size", "bits", "tile_o",
                                    "interpret"))
def quantized_matvec(x: jnp.ndarray, w_packed: jnp.ndarray,
                     scales: jnp.ndarray, biases: jnp.ndarray,
                     group_size: int = 64, bits: int = 4,
                     tile_o: int = 512, interpret: bool = False,
                     scales_w: jnp.ndarray | None = None) -> jnp.ndarray:
    """``x [B, I] @ W.T -> [B, O]`` with W in MLX packed layout.

    Designed for decode-shaped GEMVs (small B); B is padded to the fp32
    sublane multiple and O to ``tile_o`` internally. Pass ``scales_w``
    (``expand_word_scales(scales)``, precomputed at load) to skip the
    per-call f32 scale expansion — essential inside decode loops.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, i = x.shape
    o = w_packed.shape[0]
    per_word = 32 // bits
    words = w_packed.shape[1]
    assert words * per_word == i, "packed width mismatch"
    assert i % group_size == 0 and group_size % per_word == 0
    wpg = group_size // per_word

    b_pad = _round_up(max(b, 8), 8)
    o_pad = _round_up(o, tile_o)
    n_groups = i // group_size

    xf = jnp.zeros((b_pad, i), jnp.float32).at[:b].set(x.astype(jnp.float32))
    # nibble-plane transpose: plane n holds x[:, w*per_word + n]
    x3 = xf.reshape(b_pad, words, per_word).transpose(2, 0, 1)
    # bias term outside the kernel: sum(x over each group) @ biases.T
    xg = xf.reshape(b_pad, n_groups, group_size).sum(-1)

    if scales_w is None:
        # per-call f32 scale expansion (one-shot calls only — inside a
        # decode scan this re-materializes every step; pass scales_w)
        scales_w = jnp.repeat(scales.astype(jnp.float32), wpg, axis=1)
    biases_f = biases.astype(jnp.float32)
    if o_pad > o:
        w_packed = jnp.zeros((o_pad, words), jnp.uint32).at[:o].set(w_packed)
        scales_w = jnp.zeros((o_pad, words), scales_w.dtype).at[:o].set(
            scales_w)
        biases_f = jnp.zeros((o_pad, n_groups), jnp.float32).at[:o].set(
            biases_f)

    grid = (o_pad // tile_o,)
    out = pl.pallas_call(
        _make_kernel(bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((per_word, b_pad, words), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, words), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, words), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, tile_o), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, o_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * i * o_pad + 2 * i * o_pad,
            bytes_accessed=(4 * o_pad * words
                            + scales_w.dtype.itemsize * o_pad * words
                            + 4 * b_pad * i + 4 * b_pad * o_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3, w_packed, scales_w)
    out = out + xg @ biases_f.T
    return out[:b, :o].astype(x.dtype)
