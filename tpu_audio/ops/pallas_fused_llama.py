"""Monolithic Pallas llama-family decode step (one kernel = all layers).

Sibling of :mod:`pallas_fused_decoder` (whisper) for the Llama/Orpheus
decoder: the Orpheus-3B w8 decode measures 5.1 ms/token against a 3.7 ms
HBM roofline (docs/DESIGN.md) for the same reason whisper did — ~200
decode-shaped XLA fusions per token each streaming weights at roughly
half of peak, plus [S, heads, 128] attention ops. This kernel runs the
ENTIRE layer stack (RMSNorm + GQA attention with RoPE + SwiGLU MLP x L)
as ONE ``pallas_call`` per token, streaming the int8 weights in uniform
[CH, d] blocks that Mosaic double-buffers across grid steps.

Beyond the whisper kernel, two llama-specific devices:

- **Pack-time GQA head permutation**: the q-projection's OUTPUT rows
  (and the o-projection's input columns) are reordered at pack time into
  ``[rep, kv_head, head_dim]`` order, so rep r's query block is the
  static slice ``q[:, r*dkv:(r+1)*dkv]`` laid out EXACTLY like the
  [S, dkv] K/V cache rows — grouped attention becomes ``rep`` plain
  elementwise-product + one-hot head-sum passes with zero in-kernel
  gathers or reshapes.
- **In-kernel RoPE via lane roll**: with q/k viewed as [heads, 128]
  (heads on sublanes), the half-split rotation is
  ``x*cos + roll(x, 64, lanes)*sign*sin`` where sign = [-1]*64 ++ [1]*64
  and the per-lane angle is ``position * inv_freq[lane % 64]``
  (inv_freq — including Llama-3 NTK scaling — precomputed at pack time
  as a [1, 128] lane table; cos/sin evaluate on the VPU).

Supported shapes: hidden % 512 == 0, head_dim 128, ffn % 512 == 0,
kv_dim (n_kv*128) % 512 == 0, no attention biases, non-interleaved RoPE
— Orpheus-3B / Llama-3.2 / VyvoTTS qualify. Qwen3-style per-head q/k
RMSNorm (``qk_norm``, the VyvoTTS backbone) runs in-kernel: with
head_dim == 128, each head is exactly one [sublane, 128-lane] row of the
[heads, 128] view, so the norm is a lane reduction + broadcast on the
VPU right before RoPE (weights ride normpack rows 3/4, q's in the GQA
pack permutation order). The position-major [L, S, dkv] bf16 cache caps
at S = 2048 in VMEM; longer generations fall back to the XLA loop.

Reference provenance: layer semantics mirror the reference's Llama
decoder (LlamaTTS.swift:104,206,257); the kernelization is TPU-original.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["supported", "pack_llama_weights", "fused_llama_stack",
           "fused_llama_stack_lanes", "LlamaFusedPack", "S_MAX_CAP"]

SUB = 64        # row tile for [*, d] f32 attention temporaries
CH = 512        # minimum weight-stream chunk rows (supported() floor)
CH_MAX = 1024   # preferred chunk: the kernel is grid-step-rate-bound
#                 (see pallas_fused_decoder r5 note), so _best_chunk picks
#                 the largest common divisor chunk <= CH_MAX
# position-major cache rows held in VMEM: at Orpheus dims (dkv=1024) a
# 2048-row K (or V) block is 4 MB bf16, 16 MB total double-buffered —
# comfortably inside the 128 MB VMEM alongside the 3 MB weight stream
# and ~2 MB of scratch. Covers the default 1200-token generation
# (bucket 64/128 + 1200 + 1 -> s_max 1280/1344).
S_MAX_CAP = 2048


class LlamaFusedPack(NamedTuple):
    wstream: jnp.ndarray     # [L, R, d] int8 (q',k,v,o',gate,up,down')
    row_scales: jnp.ndarray  # [L, R] f32 (1.0 over the down section)
    normpack: jnp.ndarray    # [L, 8, d] f32 (norm weights, down scale)
    winv: jnp.ndarray        # [1, 128] f32 lane table: inv_freq[l % 64]


def _best_chunk(d: int, dkv: int, ffn: int) -> int:
    """Largest chunk in {1024, 512} dividing every stream stage."""
    for c in (CH_MAX, CH):
        if d % c == 0 and dkv % c == 0 and ffn % c == 0:
            return c
    raise ValueError(f"no valid chunk for d={d} dkv={dkv} ffn={ffn}")


def supported(cfg) -> bool:
    d = cfg.hidden_size
    hd = cfg.resolved_head_dim
    dkv = cfg.num_key_value_heads * hd
    return (hd == 128 and d % CH == 0 and dkv % CH == 0
            and cfg.num_attention_heads * hd == d
            and cfg.intermediate_size % CH == 0
            and cfg.num_attention_heads % cfg.num_key_value_heads == 0
            and cfg.num_key_value_heads <= 128
            and not cfg.attention_bias
            and not cfg.rope_interleaved
            and cfg.residual_multiplier == 1.0
            and cfg.attention_multiplier is None)


def _as_int8(w):
    from tpu_audio.core import quant

    if isinstance(w, quant.Int8Tensor):
        return w.weight, w.scale.astype(jnp.float32)
    t = quant.quantize_int8_jax(w)
    return t.weight, t.scale.astype(jnp.float32)


def _gqa_perm(n_heads: int, n_kv: int, hd: int) -> np.ndarray:
    """Row permutation mapping HF head order -> [rep, kv_head, hd]."""
    rep = n_heads // n_kv
    idx = np.arange(n_heads * hd).reshape(n_kv, rep, hd)
    return idx.transpose(1, 0, 2).reshape(-1)  # [rep*n_kv*hd]


def pack_llama_weights(params, cfg) -> LlamaFusedPack:
    """Pack stacked llama layer params into the kernel stream (jitted —
    one dispatch). ``params`` may be the model tree ({"layers": ...}) or
    the layers subtree; fused qkv/gate_up projections are rejected (pack
    from the unfused tree)."""
    lp = params
    for key in ("model", "layers"):
        if isinstance(lp, dict) and key in lp:
            lp = lp[key]
    if "qkv_proj" in lp["self_attn"] or "gate_up_proj" in lp["mlp"]:
        raise ValueError("pack from the UNFUSED projection tree "
                         "(before llama.fuse_projections)")
    return jax.jit(functools.partial(_pack_impl, cfg=cfg))(lp)


def _pack_impl(lp, *, cfg) -> LlamaFusedPack:
    from tpu_audio.core import nn

    d = cfg.hidden_size
    hd = cfg.resolved_head_dim
    n_heads = cfg.num_attention_heads
    n_kv = cfg.num_key_value_heads
    ffn = cfg.intermediate_size
    L = cfg.num_hidden_layers
    perm = jnp.asarray(_gqa_perm(n_heads, n_kv, hd))

    ap, mp = lp["self_attn"], lp["mlp"]
    q_w8, q_s = _as_int8(ap["q_proj"]["weight"])
    segs = [q_w8[:, perm, :]]          # q rows permuted to [rep, kv, hd]
    scls = [q_s[:, perm]]
    for proj in (ap["k_proj"], ap["v_proj"]):
        w8, s = _as_int8(proj["weight"])
        segs.append(w8)
        scls.append(s)
    # o_proj: INPUT columns permuted to match the permuted attn output
    o_w8, o_s = _as_int8(ap["o_proj"]["weight"])
    segs.append(o_w8[:, :, perm])
    scls.append(o_s)
    for proj in (mp["gate_proj"], mp["up_proj"]):
        w8, s = _as_int8(proj["weight"])
        segs.append(w8)
        scls.append(s)
    # down_proj input-major: [L, d, ffn] -> [L, ffn, d]; per-out-channel
    # scale moves to the norm pack
    dn_w8, dn_s = _as_int8(mp["down_proj"]["weight"])
    segs.append(jnp.transpose(dn_w8, (0, 2, 1)))
    scls.append(jnp.ones((L, ffn), jnp.float32))

    wstream = jnp.concatenate(segs, axis=1)
    row_scales = jnp.concatenate(scls, axis=1)

    norm = jnp.zeros((L, 8, d), jnp.float32)
    norm = norm.at[:, 0].set(
        lp["input_layernorm"]["weight"].astype(jnp.float32))
    norm = norm.at[:, 1].set(
        lp["post_attention_layernorm"]["weight"].astype(jnp.float32))
    norm = norm.at[:, 2].set(dn_s)
    if cfg.qk_norm:
        # rows 3/4: per-head q/k RMSNorm weights as flat lane tables.
        # HF ships [hd] (shared across heads); init_random_params uses
        # [n, hd] — broadcast either, then put q's in the SAME pack
        # permutation as the q rows so the kernel's [rep, kv, hd] view
        # lines up.
        qw = jnp.broadcast_to(
            ap["q_norm"]["weight"].astype(jnp.float32).reshape(L, -1, hd),
            (L, n_heads, hd)).reshape(L, d)
        kw = jnp.broadcast_to(
            ap["k_norm"]["weight"].astype(jnp.float32).reshape(L, -1, hd),
            (L, n_kv, hd)).reshape(L, n_kv * hd)
        norm = norm.at[:, 3].set(qw[:, perm])
        norm = norm.at[:, 4, :n_kv * hd].set(kw)

    scaling = None
    rs = cfg.rope_scaling
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        scaling = rs
    inv = nn.rope_freqs(hd, cfg.rope_theta, scaling)        # [64]
    winv = jnp.tile(inv, 2)[None, :]                        # [1, 128]
    return LlamaFusedPack(wstream, row_scales, norm, winv)


def _build_kernel(*, d: int, n_heads: int, n_kv: int, ffn: int,
                  s_max: int, L: int, eps: float, qk_norm: bool = False,
                  ch: int = CH):
    from jax.experimental import pallas as pl

    hd = 128
    dkv = n_kv * hd
    rep = n_heads // n_kv
    CH = ch                       # shadows the module floor constant
    nq, nk, nv, no = d // CH, dkv // CH, dkv // CH, d // CH
    ng = nd = ffn // CH
    C_Q = 0
    C_K = C_Q + nq
    C_V = C_K + nk
    C_O = C_V + nv
    C_G = C_O + no
    C_U = C_G + ng
    C_D = C_U + ng
    STEPS = C_D + nd
    sm = 1.0 / math.sqrt(hd)

    def hsum(dtype=jnp.float32):    # [dkv, 128] one-hot kv-head folder
        return (jax.lax.broadcasted_iota(jnp.int32, (dkv, 128), 0) // hd ==
                jax.lax.broadcasted_iota(jnp.int32, (dkv, 128), 1)
                ).astype(dtype)

    def hsum_t(dtype=jnp.float32):  # [128, dkv]
        return (jax.lax.broadcasted_iota(jnp.int32, (128, dkv), 1) // hd ==
                jax.lax.broadcasted_iota(jnp.int32, (128, dkv), 0)
                ).astype(dtype)

    def kernel(off_ref, x_ref, w_ref, ws_ref, norm_ref, winv_ref,
               kc_ref, vc_ref,
               y_ref, nk_ref, nv_ref,
               resid, xq8, xs_s, qbuf, kbuf, vbuf, abuf, h, hq8, hs_s,
               csc):
        from jax.experimental.pallas import tpu as pltpu

        lyr = pl.program_id(0)
        c = pl.program_id(1)
        off = off_ref[0, 0]
        start = off_ref[0, 1]  # first attendable row (left-pad mask)
        row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, d), 0) == 0)
        nrm = norm_ref[0]

        def quantize_row0(x, full_d=d):
            s = jnp.maximum(jnp.max(jnp.abs(x[0:1, :])) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(x / s), -127, 127)
            r0 = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) == 0)
            xq8[:, :full_d] = jnp.where(r0, q, 0.0).astype(jnp.int8)
            xs_s[0] = s

        def rms_norm(x, wrow):
            xf = x[0:1, :]
            y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1,
                                            keepdims=True) + eps)
            y = y * nrm[wrow:wrow + 1, :]
            return jnp.where(row0, jnp.broadcast_to(y, (8, d)), 0.0)

        def gemv_chunk(n_in=d):
            acc = jax.lax.dot_general(
                xq8[:, :n_in], w_ref[0, :, :n_in],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (ws_ref[0, 0] * xs_s[0])

        def head_rms(vec, n, wrow, col0):
            """Qwen3 per-head RMSNorm on ``vec [1, n]`` viewed as
            [n/128 heads, 128]: a lane reduction per head row, scaled by
            the packed weight table slice (already in pack-perm order
            for q)."""
            if not qk_norm:
                return vec
            xm = vec.reshape(n // 128, 128)
            y = xm * jax.lax.rsqrt(
                jnp.mean(xm * xm, axis=1, keepdims=True) + eps)
            w = norm_ref[0, wrow:wrow + 1, col0:col0 + n].reshape(
                n // 128, 128)
            return (y * w).reshape(1, n)

        def rope(vec, n):
            """Half-split RoPE on ``vec [1, n]`` (n = d or dkv) viewed as
            [n/128 heads, 128]: x*cos + roll(x,64)*sign*sin with the
            per-lane angle off * winv[lane]."""
            heads = n // 128
            xm = vec.reshape(heads, 128)
            ang = off.astype(jnp.float32) * winv_ref[0:1, :]    # [1,128]
            cosv = jnp.cos(ang)
            sinv = jnp.sin(ang)
            sign = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < 64,
                -1.0, 1.0)
            rot = pltpu.roll(xm, shift=64, axis=1)
            out = xm * cosv + rot * (sign * sinv)
            return out.reshape(1, n)

        # ---- attention projections --------------------------------------
        @pl.when(c == C_Q)
        def _():
            @pl.when(lyr == 0)
            def _():
                resid[:] = x_ref[:]
            quantize_row0(rms_norm(resid[:], 0))

        for j in range(nq):
            @pl.when(c == C_Q + j)
            def _(j=j):
                qbuf[:, j * CH:(j + 1) * CH] = gemv_chunk()

        for c0, buf, n in ((C_K, kbuf, nk), (C_V, vbuf, nv)):
            for j in range(n):
                @pl.when(c == c0 + j)
                def _(buf=buf, j=j):
                    buf[:, j * CH:(j + 1) * CH] = gemv_chunk()

        # ---- GQA attention (at the first o chunk) ------------------------
        @pl.when(c == C_O)
        def _():
            hh = hsum()
            hht = hsum_t()
            krot = rope(head_rms(kbuf[0:1, :dkv], dkv, 4, 0), dkv)
            nk_ref[0] = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (8, dkv), 0) == 0,
                jnp.broadcast_to(krot, (8, dkv)), 0.0)
            nv_ref[0] = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (8, dkv), 0) == 0,
                jnp.broadcast_to(vbuf[0:1, :dkv], (8, dkv)), 0.0)
            pos_s = jax.lax.broadcasted_iota(jnp.int32, (s_max, 128), 0)
            pos_d = jax.lax.broadcasted_iota(jnp.int32, (SUB, dkv), 0)
            nsub = s_max // SUB
            for r in range(rep):
                qr = rope(head_rms(qbuf[0:1, r * dkv:(r + 1) * dkv],
                                   dkv, 3, r * dkv), dkv) * sm

                def score_tile(i, _, qr=qr):
                    kk = kc_ref[0, pl.ds(i * SUB, SUB), :].astype(
                        jnp.float32)
                    rp = pos_d + i * SUB
                    kk = jnp.where(rp == off,
                                   jnp.broadcast_to(krot, kk.shape), kk)
                    csc[pl.ds(i * SUB, SUB), :] = jnp.dot(
                        kk * qr, hh, preferred_element_type=jnp.float32)
                    return 0

                jax.lax.fori_loop(0, nsub, score_tile, 0)
                sc = csc[0:s_max, :]
                valid = (pos_s <= off) & (pos_s >= start)
                sc = jnp.where(valid, sc, -1e9)
                mx = jnp.max(sc, axis=0, keepdims=True)
                p = jnp.where(valid, jnp.exp(sc - mx), 0.0)
                csc[0:s_max, :] = p / jnp.sum(p, axis=0, keepdims=True)

                def pv_tile(i, acc):
                    pr = csc[pl.ds(i * SUB, SUB), :]
                    pexp = jnp.dot(pr, hht,
                                   preferred_element_type=jnp.float32)
                    vv = vc_ref[0, pl.ds(i * SUB, SUB), :].astype(
                        jnp.float32)
                    rp = pos_d + i * SUB
                    vv = jnp.where(
                        rp == off,
                        jnp.broadcast_to(vbuf[0:1, :dkv], vv.shape), vv)
                    return acc + jnp.sum(pexp * vv, axis=0, keepdims=True)

                av = jax.lax.fori_loop(0, nsub, pv_tile,
                                       jnp.zeros((1, dkv), jnp.float32))
                abuf[0:1, r * dkv:(r + 1) * dkv] = av
            quantize_row0(jnp.where(row0, abuf[:], 0.0))

        for j in range(no):
            @pl.when(c == C_O + j)
            def _(j=j):
                resid[:, j * CH:(j + 1) * CH] = (
                    resid[:, j * CH:(j + 1) * CH] + gemv_chunk())

        # ---- SwiGLU MLP ---------------------------------------------------
        @pl.when(c == C_G)
        def _():
            quantize_row0(rms_norm(resid[:], 1))

        for j in range(ng):
            @pl.when(c == C_G + j)
            def _(j=j):
                h[:, j * CH:(j + 1) * CH] = gemv_chunk()

        for j in range(ng):
            @pl.when(c == C_U + j)
            def _(j=j):
                g = h[:, j * CH:(j + 1) * CH]
                u = gemv_chunk()
                h[:, j * CH:(j + 1) * CH] = g * jax.nn.sigmoid(g) * u

        @pl.when(c == C_D)
        def _():
            hf = h[:]
            s = jnp.maximum(jnp.max(jnp.abs(hf[0:1, :])) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(hf / s), -127, 127)
            rr = (jax.lax.broadcasted_iota(jnp.int32, (8, ffn), 0) == 0)
            hq8[:] = jnp.where(rr, q, 0.0).astype(jnp.int8)
            hs_s[0] = s

        for j in range(nd):
            @pl.when(c == C_D + j)
            def _(j=j):
                acc = jax.lax.dot_general(
                    hq8[:, j * CH:(j + 1) * CH], w_ref[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                resid[:] = resid[:] + acc.astype(jnp.float32) * (
                    nrm[2:3, :] * hs_s[0])

        @pl.when((lyr == L - 1) & (c == STEPS - 1))
        def _():
            y_ref[:] = jnp.where(row0, resid[:], 0.0)

    return kernel, STEPS, dict(C_K=C_K, C_V=C_V)


def fused_llama_stack(pack: LlamaFusedPack, kcache, vcache, x, offset, *,
                      cfg, valid_from=0, interpret: bool = False,
                      ch: int | None = None):
    """One token through the whole llama layer stack.

    x: [8, d] f32 (embedded token, live row 0); kcache/vcache:
    [L, S, dkv] bf16 position-major (S <= S_MAX_CAP, multiple of SUB;
    K rows stored ROTATED — the kernel outputs post-RoPE newk). Returns
    (y [8, d] f32 pre-final-norm, newk [L, 8, dkv], newv [L, 8, dkv]).
    ``valid_from`` masks cache rows below it out of attention — the
    left-pad convention of :class:`core.kv_cache.KVCache.valid_from`.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = cfg.hidden_size
    L = cfg.num_hidden_layers
    ffn = cfg.intermediate_size
    dkv = cfg.num_key_value_heads * 128
    s_max = kcache.shape[1]
    assert s_max % SUB == 0 and s_max <= S_MAX_CAP
    if ch is None:
        ch = _best_chunk(d, dkv, ffn)

    kernel, STEPS, _ = _build_kernel(
        d=d, n_heads=cfg.num_attention_heads,
        n_kv=cfg.num_key_value_heads, ffn=ffn, s_max=s_max, L=L,
        eps=cfg.rms_norm_eps, qk_norm=cfg.qk_norm, ch=ch)

    # weight-chunk widths vary by stage (d for q/o/gate/up/down-chunks,
    # dkv for k/v) — blocks are uniformly [CH, d] with k/v rows stored
    # d-wide zero-padded at pack time when dkv < d? No: dkv rows are a
    # contiguous [*, d]-wide slab only if dkv == d. Instead the stream
    # keeps EVERY row d wide; k/v segment rows come from [dkv, d]
    # matrices, so they are already [*, d]. Chunk index is linear.
    def w_idx(l, c):
        return (l, c, 0)

    y, nk, nv = pl.pallas_call(
        kernel,
        grid=(L, STEPS),
        in_specs=[
            pl.BlockSpec((1, 2), lambda l, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, d), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, d), w_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, ch), lambda l, c: (l, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, dkv), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, dkv), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, d), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, dkv), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, dkv), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, dkv), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, dkv), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, d), jnp.float32),      # resid
            pltpu.VMEM((8, d), jnp.int8),          # xq8
            pltpu.SMEM((1,), jnp.float32),         # xs_s
            pltpu.VMEM((8, d), jnp.float32),       # qbuf (permuted order)
            pltpu.VMEM((8, d), jnp.float32),       # kbuf (dkv valid)
            pltpu.VMEM((8, d), jnp.float32),       # vbuf (dkv valid)
            pltpu.VMEM((8, d), jnp.float32),       # abuf (permuted order)
            pltpu.VMEM((8, ffn), jnp.float32),     # h (gate, then act)
            pltpu.VMEM((8, ffn), jnp.int8),        # hq8
            pltpu.SMEM((1,), jnp.float32),         # hs_s
            pltpu.VMEM((s_max, 128), jnp.float32),  # csc (per-rep scores)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * pack.wstream.shape[1] * d * L,
            bytes_accessed=(pack.wstream.size
                            + kcache.size * 2 + vcache.size * 2),
            transcendentals=8 * ffn * L,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.stack([jnp.asarray(offset, jnp.int32),
                 jnp.asarray(valid_from, jnp.int32)]).reshape(1, 2), x,
      pack.wstream, pack.row_scales.reshape(L, -1, 1, ch), pack.normpack,
      pack.winv, kcache, vcache)
    return y, nk, nv


# ---------------------------------------------------------------------------
# M-lane serving variant (sibling of pallas_fused_decoder.fused_stack_lanes):
# one kernel decodes one token for EVERY live lane of a continuous-batching
# engine (parallel/continuous.py ContinuousTTS), sharing the single weight
# sweep across lanes. The [8, d] int8 MXU activation rows that carry 7 dead
# padding rows at B=1 carry one row per lane (per-ROW dynamic scales); the
# per-lane state (position-major self cache, write offset, left-pad start)
# unrolls into the grid timeline — attention runs one lane per grid step
# with that lane's cache block pinned by the index map. RoPE + qk_norm for
# ALL rows run in one grid step on the [8*heads, 128] view with per-lane
# angle tables precomputed XLA-side from the offsets.
# ---------------------------------------------------------------------------


def _build_kernel_lanes(*, d: int, n_heads: int, n_kv: int, ffn: int,
                        s_max: int, L: int, eps: float, n: int,
                        qk_norm: bool = False, ch: int = CH):
    from jax.experimental import pallas as pl

    hd = 128
    dkv = n_kv * hd
    rep = n_heads // n_kv
    CH = ch
    nq, nk_c, nv_c, no = d // CH, dkv // CH, dkv // CH, d // CH
    ng = nd = ffn // CH
    C_Q = 0
    C_K = C_Q + nq
    C_V = C_K + nk_c
    C_R = C_V + nv_c              # 1 step: qk_norm + RoPE, all rows
    C_SA = C_R + 1                # n per-lane attention steps
    C_O = C_SA + n
    C_G = C_O + no
    C_U = C_G + ng
    C_D = C_U + ng
    STEPS = C_D + nd
    KO = nq + nk_c + nv_c         # o-projection's first weight chunk
    sm = 1.0 / math.sqrt(hd)

    def hsum(dtype=jnp.float32):    # [dkv, 128] one-hot kv-head folder
        return (jax.lax.broadcasted_iota(jnp.int32, (dkv, 128), 0) // hd ==
                jax.lax.broadcasted_iota(jnp.int32, (dkv, 128), 1)
                ).astype(dtype)

    def hsum_t(dtype=jnp.float32):  # [128, dkv]
        return (jax.lax.broadcasted_iota(jnp.int32, (128, dkv), 1) // hd ==
                jax.lax.broadcasted_iota(jnp.int32, (128, dkv), 0)
                ).astype(dtype)

    def kernel(off_ref, x_ref, cq_ref, sq_ref, ck_ref, sk_ref,
               w_ref, ws_ref, norm_ref,
               kc_ref, vc_ref,
               y_ref, nk_ref, nv_ref,
               resid, xq8, xs_v, qbuf, kbuf, vbuf, abuf, h, hq8, hs_v,
               csc):
        from jax.experimental.pallas import tpu as pltpu

        lyr = pl.program_id(0)
        c = pl.program_id(1)
        nrm = norm_ref[0]

        def quantize_rows(x):
            """Per-ROW dynamic int8 quantization (each lane its own
            scale; dead rows quantize garbage harmlessly)."""
            s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                            / 127.0, 1e-12)
            xq8[:] = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
            xs_v[:] = s

        def rms_norm(x, wrow):
            y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1,
                                           keepdims=True) + eps)
            return y * nrm[wrow:wrow + 1, :]

        def gemv_chunk():
            acc = jax.lax.dot_general(
                xq8[:], w_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * ws_ref[0, 0] * xs_v[:]

        def head_rms_rows(xm, rows, wrow, width):
            """Per-head RMSNorm on [rows, 128] (a [8, width] buffer slice
            viewed head-major); weight row tiled across the 8 lanes."""
            if not qk_norm:
                return xm
            y = xm * jax.lax.rsqrt(
                jnp.mean(xm * xm, axis=1, keepdims=True) + eps)
            w = jnp.tile(nrm[wrow:wrow + 1, :width].reshape(-1, 128),
                         (8, 1))
            return y * w

        def rope_rows(xm, cos_t, sin_t):
            """Half-split RoPE on [rows, 128] with per-row angle tables
            (precomputed XLA-side: row r*H+h carries lane r's angle)."""
            sign = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < 64,
                -1.0, 1.0)
            rot = pltpu.roll(xm, shift=64, axis=1)
            return xm * cos_t + rot * (sign * sin_t)

        # ---- projections ------------------------------------------------
        @pl.when(c == C_Q)
        def _():
            @pl.when(lyr == 0)
            def _():
                resid[:] = x_ref[:]
            quantize_rows(rms_norm(resid[:], 0))

        for j in range(nq):
            @pl.when(c == C_Q + j)
            def _(j=j):
                qbuf[:, j * CH:(j + 1) * CH] = gemv_chunk()

        for c0, buf, cnt in ((C_K, kbuf, nk_c), (C_V, vbuf, nv_c)):
            for j in range(cnt):
                @pl.when(c == c0 + j)
                def _(buf=buf, j=j):
                    buf[:, j * CH:(j + 1) * CH] = gemv_chunk()

        # ---- qk_norm + RoPE for all rows, new K/V out -------------------
        @pl.when(c == C_R)
        def _():
            km = kbuf[:, :dkv].reshape(8 * n_kv, 128)
            km = head_rms_rows(km, 8 * n_kv, 4, dkv)
            km = rope_rows(km, ck_ref[:], sk_ref[:])
            kbuf[:, :dkv] = km.reshape(8, dkv)
            nk_ref[0] = kbuf[:, :dkv]
            nv_ref[0] = vbuf[:, :dkv]
            qm = qbuf[:].reshape(8 * n_heads, 128)
            qm = head_rms_rows(qm, 8 * n_heads, 3, d)
            qm = rope_rows(qm, cq_ref[:], sq_ref[:])
            qbuf[:] = qm.reshape(8, d)

        # ---- per-lane GQA attention (one lane per grid step) ------------
        @pl.when((c >= C_SA) & (c < C_SA + n))
        def _():
            m = c - C_SA
            off = off_ref[0, m]
            start = off_ref[1, m]
            hh = hsum()
            hht = hsum_t()
            krow = kbuf[pl.ds(m, 1), :dkv]
            vrow = vbuf[pl.ds(m, 1), :dkv]
            pos_s = jax.lax.broadcasted_iota(jnp.int32, (s_max, 128), 0)
            pos_d = jax.lax.broadcasted_iota(jnp.int32, (SUB, dkv), 0)
            nsub = s_max // SUB
            for r in range(rep):
                qr = qbuf[pl.ds(m, 1), r * dkv:(r + 1) * dkv] * sm

                def score_tile(i, _, qr=qr):
                    kk = kc_ref[0, 0, pl.ds(i * SUB, SUB), :].astype(
                        jnp.float32)
                    rp = pos_d + i * SUB
                    kk = jnp.where(rp == off,
                                   jnp.broadcast_to(krow, kk.shape), kk)
                    csc[pl.ds(i * SUB, SUB), :] = jnp.dot(
                        kk * qr, hh, preferred_element_type=jnp.float32)
                    return 0

                jax.lax.fori_loop(0, nsub, score_tile, 0)
                sc = csc[0:s_max, :]
                valid = (pos_s <= off) & (pos_s >= start)
                sc = jnp.where(valid, sc, -1e9)
                mx = jnp.max(sc, axis=0, keepdims=True)
                p = jnp.where(valid, jnp.exp(sc - mx), 0.0)
                csc[0:s_max, :] = p / jnp.sum(p, axis=0, keepdims=True)

                def pv_tile(i, acc):
                    pr = csc[pl.ds(i * SUB, SUB), :]
                    pexp = jnp.dot(pr, hht,
                                   preferred_element_type=jnp.float32)
                    vv = vc_ref[0, 0, pl.ds(i * SUB, SUB), :].astype(
                        jnp.float32)
                    rp = pos_d + i * SUB
                    vv = jnp.where(rp == off,
                                   jnp.broadcast_to(vrow, vv.shape), vv)
                    return acc + jnp.sum(pexp * vv, axis=0, keepdims=True)

                av = jax.lax.fori_loop(0, nsub, pv_tile,
                                       jnp.zeros((1, dkv), jnp.float32))
                abuf[pl.ds(m, 1), r * dkv:(r + 1) * dkv] = av

            @pl.when(m == n - 1)
            def _():
                quantize_rows(abuf[:])

        for j in range(no):
            @pl.when(c == C_O + j)
            def _(j=j):
                resid[:, j * CH:(j + 1) * CH] = (
                    resid[:, j * CH:(j + 1) * CH] + gemv_chunk())

        # ---- SwiGLU MLP -------------------------------------------------
        @pl.when(c == C_G)
        def _():
            quantize_rows(rms_norm(resid[:], 1))

        for j in range(ng):
            @pl.when(c == C_G + j)
            def _(j=j):
                h[:, j * CH:(j + 1) * CH] = gemv_chunk()

        for j in range(ng):
            @pl.when(c == C_U + j)
            def _(j=j):
                g = h[:, j * CH:(j + 1) * CH]
                u = gemv_chunk()
                h[:, j * CH:(j + 1) * CH] = g * jax.nn.sigmoid(g) * u

        @pl.when(c == C_D)
        def _():
            hf = h[:]
            s = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
                            / 127.0, 1e-12)
            hq8[:] = jnp.clip(jnp.round(hf / s), -127, 127).astype(jnp.int8)
            hs_v[:] = s

        for j in range(nd):
            @pl.when(c == C_D + j)
            def _(j=j):
                acc = jax.lax.dot_general(
                    hq8[:, j * CH:(j + 1) * CH], w_ref[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                resid[:] = resid[:] + acc.astype(jnp.float32) * (
                    nrm[2:3, :] * hs_v[:])

        @pl.when((lyr == L - 1) & (c == STEPS - 1))
        def _():
            y_ref[:] = resid[:]

    # weight chunk: linear through q/k/v, pinned at o's first chunk (KO)
    # across the rope + per-lane attention steps, then linear again
    def w_chunk(c):
        return jnp.where(c < C_R, c,
                         jnp.clip(c - (1 + n), KO,
                                  KO + no + 2 * ng + nd - 1))

    def w_idx(l, c):
        return (l, w_chunk(c), 0)

    def ws_idx(l, c):
        return (l, w_chunk(c), 0, 0)

    def sa_lane(c):
        return jnp.clip(c - C_SA, 0, n - 1)

    def kc_idx(l, c):
        return (sa_lane(c), l, 0, 0)

    return kernel, STEPS, dict(w_idx=w_idx, ws_idx=ws_idx, kc_idx=kc_idx)


def fused_llama_stack_lanes(pack: LlamaFusedPack, kcache, vcache, x,
                            offsets, starts, *, cfg,
                            interpret: bool = False,
                            ch: int | None = None):
    """One token through the whole llama stack for EACH of n lanes.

    x: [8, d] f32 — rows 0..n-1 are the lanes' embedded tokens (rows
    n..7 dead); kcache/vcache: [n, L, s_max, dkv] bf16 position-major
    per-lane caches (K rows post-RoPE); offsets/starts: [8] int32
    per-lane write position / first attendable row (left-pad mask,
    rows >= n ignored). Returns (y [8, d] f32 pre-final-norm,
    newk [L, 8, dkv], newv [L, 8, dkv]) — column m is lane m's new
    (rotated) K / V row, to scatter at ``offsets[m]``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = cfg.hidden_size
    L = cfg.num_hidden_layers
    ffn = cfg.intermediate_size
    n_heads = cfg.num_attention_heads
    n_kv = cfg.num_key_value_heads
    dkv = n_kv * 128
    nl, _, s_max, _ = kcache.shape
    assert s_max % SUB == 0 and s_max <= S_MAX_CAP and 1 <= nl <= 8
    if ch is None:
        ch = _best_chunk(d, dkv, ffn)

    kernel, STEPS, idx = _build_kernel_lanes(
        d=d, n_heads=n_heads, n_kv=n_kv, ffn=ffn, s_max=s_max, L=L,
        eps=cfg.rms_norm_eps, n=nl, qk_norm=cfg.qk_norm, ch=ch)

    offsets = jnp.asarray(offsets, jnp.int32).reshape(8)
    starts = jnp.asarray(starts, jnp.int32).reshape(8)
    # per-lane RoPE angle tables, expanded head-major XLA-side so the
    # kernel's [8*H, 128] views line up row-for-row
    ang = offsets[:, None].astype(jnp.float32) * pack.winv      # [8, 128]
    cq = jnp.repeat(jnp.cos(ang), n_heads, axis=0)              # [8H, 128]
    sq = jnp.repeat(jnp.sin(ang), n_heads, axis=0)
    ckt = jnp.repeat(jnp.cos(ang), n_kv, axis=0)                # [8kv, 128]
    skt = jnp.repeat(jnp.sin(ang), n_kv, axis=0)

    y, nk, nv = pl.pallas_call(
        kernel,
        grid=(L, STEPS),
        in_specs=[
            pl.BlockSpec((2, 8), lambda l, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, d), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * n_heads, 128), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * n_heads, 128), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * n_kv, 128), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * n_kv, 128), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch, d), idx["w_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, ch), idx["ws_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_max, dkv), idx["kc_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_max, dkv), idx["kc_idx"],
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, d), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, dkv), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, dkv), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, dkv), jnp.float32),
            jax.ShapeDtypeStruct((L, 8, dkv), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, d), jnp.float32),      # resid
            pltpu.VMEM((8, d), jnp.int8),          # xq8
            pltpu.VMEM((8, 1), jnp.float32),       # xs_v (per-row)
            pltpu.VMEM((8, d), jnp.float32),       # qbuf (perm order)
            pltpu.VMEM((8, d), jnp.float32),       # kbuf (dkv valid)
            pltpu.VMEM((8, d), jnp.float32),       # vbuf (dkv valid)
            pltpu.VMEM((8, d), jnp.float32),       # abuf (perm order)
            pltpu.VMEM((8, ffn), jnp.float32),     # h
            pltpu.VMEM((8, ffn), jnp.int8),        # hq8
            pltpu.VMEM((8, 1), jnp.float32),       # hs_v
            pltpu.VMEM((s_max, 128), jnp.float32),  # csc
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * pack.wstream.shape[1] * d * L,
            bytes_accessed=(pack.wstream.size
                            + kcache.size * 2 + vcache.size * 2),
            transcendentals=8 * ffn * L,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.stack([offsets, starts]), x, cq, sq, ckt, skt,
      pack.wstream, pack.row_scales.reshape(L, -1, 1, ch), pack.normpack,
      kcache, vcache)
    return y, nk, nv
