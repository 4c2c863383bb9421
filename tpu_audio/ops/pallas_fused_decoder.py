"""Monolithic Pallas whisper-decoder decode step (one kernel = 32 layers).

The measured whisper-large-v3 w8 decode floor is 2.80 ms/token against a
~1.15 ms/token HBM roofline (docs/DESIGN.md "The whisper decode floor"):
XLA executes ~280 decode-shaped fusions per token, each streaming
0.8-13 MB of weights for an M=8 activation at roughly half of peak HBM
bandwidth, and the attention blocks add [448, 20, 64]-shaped ops whose
64-wide head dim wastes half of every 128-lane transfer. This kernel
replaces the ENTIRE per-token layer stack (self-attn + cross-attn + MLP
x 32 layers) with ONE ``pallas_call`` whose grid streams every byte the
token needs — int8 decoder weights, int8 cross-attention K/V, bf16
self-attention cache — through VMEM in uniform [CHUNK, d] blocks that
Mosaic double-buffers automatically across grid steps.

Design (vs the reference's per-op MLX graph, WhisperModel.swift:228-269,
and this repo's XLA scan in stt/whisper.py:decoder_step):

- **Uniform weight stream**: per layer, q/k/v/o/cross-q/cross-o
  ([d, d] each) + fc1 ([4d, d]) + fc2 stored input-major ([4d, d], so
  its chunks ACCUMULATE into the full output instead of producing output
  slices) concatenate into a [14d, d] int8 row-stream — 14 chunks of
  [d, d] by default (r5; r4 used 28 chunks of [d/2, d] — the kernel is
  grid-step-rate-bound, not HBM-bound, so fewer/bigger steps win; the
  chunk is the ``ch`` parameter). Cross K/V ride separate per-request
  int8 inputs (chunked [d/2, d] independently of ``ch``) whose block
  index maps PIN to the upcoming chunk outside their stage window, so
  nothing is ever re-fetched.
- **Activations never leave VMEM**: the residual, LN outputs, q/k/v,
  attention vectors, and the 4d MLP hidden live in scratch across all
  grid steps; only the final [1, d] hidden returns to HBM.
- **int8 MXU dots**: activations are dynamically quantized per stage
  (scale from row 0, the only live row) and hit the s8xs8->s32 MXU path
  — zero per-weight vector work, exactly like core.quant.int8_matmul.
- **Head-sum attention**: scores = (K ⊙ q) @ H where H[dd, h] = 1 iff
  dd//head_dim == h — a one-hot matmul that contracts the feature dim
  per head with NO reshapes/transposes of the [S, d] cache (Mosaic-
  friendly, full 128-lane reads). P@V runs the same trick transposed.
  Both are tiled in SUB=64-row slices to bound VMEM temporaries.
- **No in-kernel cache writes** (Mosaic rejects stores into input
  blocks on this backend): the current token's k/v contribution is
  injected into the score/value streams with position-selects, and the
  new rows are kernel OUTPUTS that the XLA wrapper scatters into the
  [L, S, d] caches afterwards (one fused dynamic_update_slice for all
  layers).
- GELU is tanh-approximate inside the kernel (Mosaic has no erf);
  difference vs the exact-GELU XLA path is below int8 quantization
  noise (tested).

Measured on v5e (large-v3, kv8d+w8 equivalent): see bench.py
``large-v3 fused`` and docs/DESIGN.md for the numbers this kernel is
accountable to.

Reference provenance: the layer semantics mirror
``/root/reference`` WhisperModel decode (WhisperLayers.swift:256,
WhisperModel.swift:228-269); the kernelization is TPU-original.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["supported", "pack_decoder_weights", "quantize_cross_kv",
           "fused_stack", "fused_stack_lanes", "FusedPack"]

SUB = 64  # row tile for [*, d] f32 attention temporaries (VMEM bound)


class FusedPack(NamedTuple):
    """Load-time packed decoder weights for the fused kernel."""

    wstream: jnp.ndarray    # [L, 14d, d] int8
    row_scales: jnp.ndarray  # [L, 14d] f32 (1.0 over the fc2 section)
    biaspack: jnp.ndarray   # [L, RB, d] f32 (LN params, biases, fc2 scale)


def supported(cfg) -> bool:
    """Static shape requirements (all published whisper sizes qualify)."""
    d = cfg.d_model
    return (d % 128 == 0 and (d // 2) % 32 == 0
            and cfg.decoder_ffn_dim == 4 * d
            and cfg.decoder_attention_heads <= 128
            and d % cfg.decoder_attention_heads == 0)


def _as_int8(w):
    """(int8 weight [.., O, I], f32 scale [.., O]) from an Int8Tensor or a
    dense array (quantized on the fly — used by tests and bf16 loads)."""
    from tpu_audio.core import quant

    if isinstance(w, quant.Int8Tensor):
        return w.weight, w.scale.astype(jnp.float32)
    t = quant.quantize_int8_jax(w)
    return t.weight, t.scale.astype(jnp.float32)


def pack_decoder_weights(params, cfg) -> FusedPack:
    """Pack the stacked decoder layer params (``model.decoder.layers``,
    leaves [L, ...]) into the kernel's uniform stream. Runs once at model
    load; accepts w8 (Int8Tensor) or dense trees. The packing itself is
    jitted (one device dispatch instead of hundreds of eager concat/set
    ops — on a tunneled chip the eager version costs minutes)."""
    lp = params["model"]["decoder"]["layers"]
    return jax.jit(functools.partial(_pack_impl, cfg=cfg))(lp)


def _pack_impl(lp, *, cfg) -> FusedPack:
    d = cfg.d_model
    ffn = cfg.decoder_ffn_dim
    L = cfg.decoder_layers

    sa, ca = lp["self_attn"], lp["encoder_attn"]
    segs, scls = [], []
    for proj in (sa["q_proj"], sa["k_proj"], sa["v_proj"], sa["out_proj"],
                 ca["q_proj"], ca["out_proj"], lp["fc1"]):
        w8, s = _as_int8(proj["weight"])
        segs.append(w8)
        scls.append(s)
    # fc2 input-major: [L, d, ffn] -> [L, ffn, d]; its per-OUT-channel
    # scale moves to the bias pack (applies after the full accumulation)
    fc2_w8, fc2_s = _as_int8(lp["fc2"]["weight"])
    segs.append(jnp.transpose(fc2_w8, (0, 2, 1)))
    scls.append(jnp.ones((L, ffn), jnp.float32))

    wstream = jnp.concatenate(segs, axis=1)
    row_scales = jnp.concatenate(scls, axis=1)

    nb_fc1 = ffn // d
    RB = -(-(13 + nb_fc1) // 8) * 8
    bias = jnp.zeros((L, RB, d), jnp.float32)
    rows = {
        0: lp["self_attn_layer_norm"]["weight"],
        1: lp["self_attn_layer_norm"]["bias"],
        2: sa["q_proj"]["bias"],
        3: sa["v_proj"]["bias"],
        4: sa["out_proj"]["bias"],
        5: lp["encoder_attn_layer_norm"]["weight"],
        6: lp["encoder_attn_layer_norm"]["bias"],
        7: ca["q_proj"]["bias"],
        8: ca["out_proj"]["bias"],
        9: lp["final_layer_norm"]["weight"],
        10: lp["final_layer_norm"]["bias"],
        11: lp["fc2"]["bias"],
        12: fc2_s,
    }
    for r, v in rows.items():
        bias = bias.at[:, r].set(v.astype(jnp.float32))
    fc1_b = lp["fc1"]["bias"].astype(jnp.float32).reshape(L, nb_fc1, d)
    bias = bias.at[:, 13:13 + nb_fc1].set(fc1_b)
    return FusedPack(wstream, row_scales, bias)


def quantize_cross_kv(cross_k, cross_v, chunk: int):
    """Dense cross K/V ([L, 1, H, S, hd] from whisper._cross_kv) ->
    position-major int8 ([L, Sp, d]) + per-position f32 scales [L, Sp],
    padded to a whole number of stream chunks."""
    def pack(t):
        L, b, H, S, hd = t.shape
        assert b == 1, "fused decoder is B=1"
        x = jnp.transpose(t[:, 0], (0, 2, 1, 3)).reshape(L, S, H * hd)
        xf = x.astype(jnp.float32)
        scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
        sp = -(-S // chunk) * chunk
        q = jnp.pad(q.astype(jnp.int8), ((0, 0), (0, sp - S), (0, 0)))
        scale = jnp.pad(scale, ((0, 0), (0, sp - S)))
        return q, scale

    ck, ks = pack(cross_k)
    cv, vs = pack(cross_v)
    return ck, ks, cv, vs


def _build_kernel(*, d: int, heads: int, ffn: int, s_max: int,
                  s_src: int, s_pad: int, L: int, ch: int):
    """The kernel body, closed over all static dims. Grid = (L, STEPS).

    ``ch`` is the weight-stream chunk (rows per grid step). r4 shipped
    ``ch = d//2``; r5 measured the kernel is grid-step-rate-bound, not
    HBM-bound (base and large-v3 both ~1.9 ms/step despite 66x the
    weight bytes), so the default grew to ``ch = d`` — one chunk per
    projection, ~0.6x the grid steps. The CROSS-attention chunk ``CC``
    stays ``d//2`` (it sets the packed cross-K/V layout,
    :func:`quantize_cross_kv`, which callers cache per request)."""
    from jax.experimental import pallas as pl

    hd = d // heads
    CH = ch                    # weight-stream chunk
    NW = d // CH               # weight chunks per d output rows (1 or 2)
    CC = d // 2                # cross-K/V stream chunk
    NC = s_pad // CC
    n_fc = ffn // CH
    # step timeline within a layer
    C_Q, C_K, C_V, C_O, C_CQ = 0, NW, 2 * NW, 3 * NW, 4 * NW
    C_CK = 5 * NW
    C_CV = C_CK + NC
    C_CO = C_CV + NC
    C_F1 = C_CO + NW
    C_F2 = C_F1 + n_fc
    STEPS = C_F2 + n_fc
    nb_fc1 = ffn // d
    sm = 1.0 / math.sqrt(hd)

    def hsum(dtype=jnp.float32):   # [d, 128] one-hot head folder
        return (jax.lax.broadcasted_iota(jnp.int32, (d, 128), 0) // hd ==
                jax.lax.broadcasted_iota(jnp.int32, (d, 128), 1)
                ).astype(dtype)

    def hsum_t(dtype=jnp.float32):  # [128, d]
        return (jax.lax.broadcasted_iota(jnp.int32, (128, d), 1) // hd ==
                jax.lax.broadcasted_iota(jnp.int32, (128, d), 0)
                ).astype(dtype)

    def kernel(off_ref, x_ref, w_ref, ws_ref, bias_ref,
               ck_ref, ks_ref, cv_ref, vs_ref, kc_ref, vc_ref,
               y_ref, nk_ref, nv_ref,
               resid, xq8, xs_s, qbuf, kbuf, vbuf, q2buf, cabuf,
               h, hq8, hs_s, csc):
        lyr = pl.program_id(0)
        c = pl.program_id(1)
        off = off_ref[0, 0]
        row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, d), 0) == 0)
        b0 = bias_ref[0]

        def quantize_row0(x):
            """Dynamic int8 quantization of the live row; dead rows -> 0
            so every downstream dot has exact zeros there."""
            s = jnp.maximum(jnp.max(jnp.abs(x[0:1, :])) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(x / s), -127, 127)
            xq8[:] = jnp.where(row0, q, 0.0).astype(jnp.int8)
            xs_s[0] = s

        def layer_norm(x, wrow, brow):
            xf = x[0:1, :]
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            zero = xf - mean
            var = jnp.mean(zero * zero, axis=-1, keepdims=True)
            y = zero * jax.lax.rsqrt(var + 1e-5)
            y = y * b0[wrow:wrow + 1, :] + b0[brow:brow + 1, :]
            return jnp.where(row0, jnp.broadcast_to(y, (8, d)), 0.0)

        def gemv_chunk():
            """xq8 [8, d] @ chunk [CH, d].T -> [8, CH] rescaled f32."""
            acc = jax.lax.dot_general(
                xq8[:], w_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * (ws_ref[0, 0] * xs_s[0])

        # ---- self-attention projections -------------------------------
        @pl.when(c == C_Q)
        def _():
            @pl.when(lyr == 0)
            def _():
                resid[:] = x_ref[:]
            quantize_row0(layer_norm(resid[:], 0, 1))

        for c0, buf, brow in ((C_Q, qbuf, 2), (C_K, kbuf, -1),
                              (C_V, vbuf, 3)):
            for j in range(NW):
                @pl.when(c == c0 + j)
                def _(buf=buf, j=j, brow=brow):
                    out = gemv_chunk()
                    if brow >= 0:
                        out = out + b0[brow:brow + 1, j * CH:(j + 1) * CH]
                    buf[:, j * CH:(j + 1) * CH] = out

        # ---- self-attention (scores/PV tiled over SUB rows) ------------
        @pl.when(c == C_O)
        def _():
            hh = hsum()
            hht = hsum_t()
            qrow = qbuf[0:1, :] * sm
            nsub = s_max // SUB

            def score_tile(i, _):
                kk = kc_ref[0, pl.ds(i * SUB, SUB), :].astype(jnp.float32)
                sc = jnp.dot(kk * qrow, hh,
                             preferred_element_type=jnp.float32)
                csc[pl.ds(i * SUB, SUB), :] = sc
                return 0

            jax.lax.fori_loop(0, nsub, score_tile, 0)
            sc_cur = jnp.dot(kbuf[0:1, :] * qrow, hh,
                             preferred_element_type=jnp.float32)
            pos = jax.lax.broadcasted_iota(jnp.int32, (s_max, 128), 0)
            sc = csc[0:s_max, :]
            sc = jnp.where(pos == off, jnp.broadcast_to(sc_cur, sc.shape),
                           sc)
            valid = pos <= off
            sc = jnp.where(valid, sc, -1e9)
            mx = jnp.max(sc, axis=0, keepdims=True)
            p = jnp.where(valid, jnp.exp(sc - mx), 0.0)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            csc[0:s_max, :] = p

            def pv_tile(i, acc):
                pr = csc[pl.ds(i * SUB, SUB), :]
                pexp = jnp.dot(pr, hht, preferred_element_type=jnp.float32)
                vv = vc_ref[0, pl.ds(i * SUB, SUB), :].astype(jnp.float32)
                # the current token's V is not in the cache yet: inject it
                rpos = (jax.lax.broadcasted_iota(jnp.int32, (SUB, d), 0)
                        + i * SUB)
                vv = jnp.where(rpos == off,
                               jnp.broadcast_to(vbuf[0:1, :], vv.shape), vv)
                return acc + jnp.sum(pexp * vv, axis=0, keepdims=True)

            av = jax.lax.fori_loop(0, nsub, pv_tile,
                                   jnp.zeros((1, d), jnp.float32))
            nk_ref[0] = kbuf[:]
            nv_ref[0] = vbuf[:]
            quantize_row0(jnp.where(row0, jnp.broadcast_to(av, (8, d)), 0.0))

        for j in range(NW):
            @pl.when(c == C_O + j)
            def _(j=j):
                resid[:, j * CH:(j + 1) * CH] = (
                    resid[:, j * CH:(j + 1) * CH] + gemv_chunk()
                    + b0[4:5, j * CH:(j + 1) * CH])

        # ---- cross-attention -------------------------------------------
        @pl.when(c == C_CQ)
        def _():
            quantize_row0(layer_norm(resid[:], 5, 6))

        for j in range(NW):
            @pl.when(c == C_CQ + j)
            def _(j=j):
                q2buf[:, j * CH:(j + 1) * CH] = (
                    gemv_chunk() + b0[7:8, j * CH:(j + 1) * CH])

        for j in range(NC):
            @pl.when(c == C_CK + j)
            def _(j=j):
                hh = hsum()
                q2row = q2buf[0:1, :] * sm
                nsub = CC // SUB

                def tile(i, _):
                    kk = ck_ref[0, pl.ds(i * SUB, SUB), :].astype(
                        jnp.float32)
                    csc[pl.ds(j * CC + i * SUB, SUB), :] = jnp.dot(
                        kk * q2row, hh, preferred_element_type=jnp.float32)
                    return 0

                jax.lax.fori_loop(0, nsub, tile, 0)
                # per-position K scale, applied to the whole chunk's score
                # rows in one static-slice pass (Mosaic has no value-level
                # dynamic_slice to do it inside the tile loop)
                csc[j * CC:(j + 1) * CC, :] = (
                    csc[j * CC:(j + 1) * CC, :]
                    * ks_ref[0, 0].reshape(CC, 1))

        @pl.when(c == C_CV)
        def _():
            # masked softmax over the full [s_pad, 128] score scratch
            pos = jax.lax.broadcasted_iota(jnp.int32, (s_pad, 128), 0)
            valid = pos < s_src
            sc = jnp.where(valid, csc[0:s_pad, :], -1e9)
            mx = jnp.max(sc, axis=0, keepdims=True)
            p = jnp.where(valid, jnp.exp(sc - mx), 0.0)
            csc[0:s_pad, :] = p / jnp.sum(p, axis=0, keepdims=True)
            cabuf[:] = jnp.zeros((8, d), jnp.float32)

        for j in range(NC):
            @pl.when(c == C_CV + j)
            def _(j=j):
                hht = hsum_t()
                nsub = CC // SUB
                # fold the per-position V scale into the prob rows once:
                # sum_s p[s] * (v[s]*vs[s]) == sum_s (p[s]*vs[s]) * v[s]
                csc[j * CC:(j + 1) * CC, :] = (
                    csc[j * CC:(j + 1) * CC, :]
                    * vs_ref[0, 0].reshape(CC, 1))

                def tile(i, acc):
                    pr = csc[pl.ds(j * CC + i * SUB, SUB), :]
                    pexp = jnp.dot(pr, hht,
                                   preferred_element_type=jnp.float32)
                    vv = cv_ref[0, pl.ds(i * SUB, SUB), :].astype(
                        jnp.float32)
                    return acc + jnp.sum(pexp * vv, axis=0, keepdims=True)

                av = jax.lax.fori_loop(0, nsub, tile,
                                       jnp.zeros((1, d), jnp.float32))
                cabuf[0:1, :] = cabuf[0:1, :] + av

        @pl.when(c == C_CO)
        def _():
            quantize_row0(jnp.where(row0, cabuf[:], 0.0))

        for j in range(NW):
            @pl.when(c == C_CO + j)
            def _(j=j):
                resid[:, j * CH:(j + 1) * CH] = (
                    resid[:, j * CH:(j + 1) * CH] + gemv_chunk()
                    + b0[8:9, j * CH:(j + 1) * CH])

        # ---- MLP --------------------------------------------------------
        @pl.when(c == C_F1)
        def _():
            quantize_row0(layer_norm(resid[:], 9, 10))

        for j in range(n_fc):
            @pl.when(c == C_F1 + j)
            def _(j=j):
                brow = 13 + (j * CH) // d
                bcol = (j * CH) % d
                out = gemv_chunk() + b0[brow:brow + 1, bcol:bcol + CH]
                h[:, j * CH:(j + 1) * CH] = jax.nn.gelu(out,
                                                        approximate=True)

        @pl.when(c == C_F2)
        def _():
            hf = h[:]
            s = jnp.maximum(jnp.max(jnp.abs(hf[0:1, :])) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(hf / s), -127, 127)
            rr = (jax.lax.broadcasted_iota(jnp.int32, (8, ffn), 0) == 0)
            hq8[:] = jnp.where(rr, q, 0.0).astype(jnp.int8)
            hs_s[0] = s

        for j in range(n_fc):
            @pl.when(c == C_F2 + j)
            def _(j=j):
                acc = jax.lax.dot_general(
                    hq8[:, j * CH:(j + 1) * CH], w_ref[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)         # [8, d]
                upd = acc.astype(jnp.float32) * (b0[12:13, :] * hs_s[0])
                if j == n_fc - 1:
                    upd = upd + b0[11:12, :]
                resid[:] = resid[:] + upd

        @pl.when((lyr == L - 1) & (c == STEPS - 1))
        def _():
            y_ref[:] = jnp.where(row0, resid[:], 0.0)

    # index maps: pin streams to the upcoming chunk outside their window
    def w_chunk(c):
        return jnp.where(c < C_CK, c,
                         jnp.where(c < C_CO, C_CK, c - 2 * NC))

    def w_idx(l, c):
        return (l, w_chunk(c), 0)

    def ws_idx(l, c):
        return (l, w_chunk(c), 0, 0)

    def ck_idx(l, c):
        return (l, jnp.clip(c - C_CK, 0, NC - 1), 0)

    def cks_idx(l, c):
        return (l, jnp.clip(c - C_CK, 0, NC - 1), 0, 0)

    def cv_idx(l, c):
        return (l, jnp.clip(c - C_CV, 0, NC - 1), 0)

    def cvs_idx(l, c):
        return (l, jnp.clip(c - C_CV, 0, NC - 1), 0, 0)

    return kernel, STEPS, (CH, CC), dict(
        w_idx=w_idx, ws_idx=ws_idx, ck_idx=ck_idx, cks_idx=cks_idx,
        cv_idx=cv_idx, cvs_idx=cvs_idx)


def fused_stack(pack: FusedPack, ck, ks, cv, vs, kcache, vcache,
                x, offset, *, cfg, s_src: int, interpret: bool = False,
                ch: int | None = None):
    """Run the full decoder layer stack for ONE token.

    x: [8, d] f32 (embedded token + position, live row 0);
    kcache/vcache: [L, S_max, d] bf16 position-major (valid < offset);
    ck/cv + ks/vs: packed cross K/V from :func:`quantize_cross_kv`.
    ``ch`` overrides the weight-stream chunk (default ``d``; ``d//2``
    reproduces the r4 kernel — see _build_kernel).
    Returns (y [8, d] f32, newk [L, 8, d] f32, newv [L, 8, d] f32) — the
    caller scatters newk/newv[:, 0] into the caches at ``offset``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = cfg.d_model
    L = cfg.decoder_layers
    ffn = cfg.decoder_ffn_dim
    s_max = kcache.shape[1]
    s_pad = ck.shape[1]
    assert s_max % SUB == 0 and s_pad % SUB == 0

    kernel, STEPS, (CH, CC), idx = _build_kernel(
        d=d, heads=cfg.decoder_attention_heads, ffn=ffn, s_max=s_max,
        s_src=s_src, s_pad=s_pad, L=L, ch=(d if ch is None else ch))

    grid = (L, STEPS)
    out_shapes = (
        jax.ShapeDtypeStruct((8, d), jnp.float32),
        jax.ShapeDtypeStruct((L, 8, d), jnp.float32),
        jax.ShapeDtypeStruct((L, 8, d), jnp.float32),
    )
    y, nk, nv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda l, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, d), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, d), idx["w_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, CH), idx["ws_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack.biaspack.shape[1], d),
                         lambda l, c: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CC, d), idx["ck_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, CC), idx["cks_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CC, d), idx["cv_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, CC), idx["cvs_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, d), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_max, d), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, d), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((8, d), jnp.float32),      # resid
            pltpu.VMEM((8, d), jnp.int8),          # xq8
            pltpu.SMEM((1,), jnp.float32),         # xs_s
            pltpu.VMEM((8, d), jnp.float32),       # qbuf
            pltpu.VMEM((8, d), jnp.float32),       # kbuf
            pltpu.VMEM((8, d), jnp.float32),       # vbuf
            pltpu.VMEM((8, d), jnp.float32),       # q2buf
            pltpu.VMEM((8, d), jnp.float32),       # cabuf
            pltpu.VMEM((8, ffn), jnp.float32),     # h
            pltpu.VMEM((8, ffn), jnp.int8),        # hq8
            pltpu.SMEM((1,), jnp.float32),         # hs_s
            pltpu.VMEM((max(s_max, s_pad), 128), jnp.float32),  # csc
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * 14 * d * d * L,
            bytes_accessed=(pack.wstream.size + ck.size + cv.size
                            + kcache.size * 2 + vcache.size * 2),
            transcendentals=8 * ffn * L,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(offset, jnp.int32).reshape(1, 1), x,
      pack.wstream, pack.row_scales.reshape(L, -1, 1, CH), pack.biaspack,
      ck, ks.reshape(L, -1, 1, CC), cv, vs.reshape(L, -1, 1, CC),
      kcache, vcache)
    return y, nk, nv


# ---------------------------------------------------------------------------
# M-lane serving variant: one kernel decodes one token for EVERY live lane
# of a continuous-batching engine (parallel/continuous_stt.py), sharing the
# single weight sweep across lanes. Per-lane state (self cache, int8 cross
# K/V, write offset) differs per request, so the lane dimension is unrolled
# into the grid TIMELINE — attention runs one lane per grid step with that
# lane's cache block pinned by the index map — while the GEMV stages run all
# 8 activation rows at once (per-ROW dynamic int8 scales; the MXU dot was
# already [8, d]-shaped in the B=1 kernel, where 7 rows were dead padding).
# VMEM stays bounded: at any step at most one lane's [s_max, d] cache blocks
# (+ the next step's prefetch) are resident, never all lanes'.
# ---------------------------------------------------------------------------


def _build_kernel_lanes(*, d: int, heads: int, ffn: int, s_max: int,
                        s_src: int, s_pad: int, L: int, n: int, ch: int):
    """Kernel body for ``n`` live lanes (static, 1..8). Grid = (L, STEPS).

    Timeline per layer: q(NW) k(NW) v(NW) | self-attn (n, one lane each)
    | o(NW) cq(NW) | cross (n*2*NC, lane-major: NC score chunks then NC
    PV chunks per lane) | co(NW) fc1(n_fc) fc2(n_fc). ``ch`` is the
    weight-stream chunk (see _build_kernel — default d, NW = 1); the
    cross chunk CC stays d//2 (packed cross-K/V layout)."""
    from jax.experimental import pallas as pl

    hd = d // heads
    CH = ch
    NW = d // CH
    CC = d // 2
    NC = s_pad // CC
    n_fc = ffn // CH
    C_Q, C_K, C_V = 0, NW, 2 * NW
    C_SA = 3 * NW                 # n per-lane self-attention steps
    C_O = C_SA + n
    C_CQ = C_O + NW
    C_X = C_CQ + NW               # n * 2*NC per-lane cross steps
    C_CO = C_X + n * 2 * NC
    C_F1 = C_CO + NW
    C_F2 = C_F1 + n_fc
    STEPS = C_F2 + n_fc
    nb_fc1 = ffn // d
    sm = 1.0 / math.sqrt(hd)

    def hsum(dtype=jnp.float32):   # [d, 128] one-hot head folder
        return (jax.lax.broadcasted_iota(jnp.int32, (d, 128), 0) // hd ==
                jax.lax.broadcasted_iota(jnp.int32, (d, 128), 1)
                ).astype(dtype)

    def hsum_t(dtype=jnp.float32):  # [128, d]
        return (jax.lax.broadcasted_iota(jnp.int32, (128, d), 1) // hd ==
                jax.lax.broadcasted_iota(jnp.int32, (128, d), 0)
                ).astype(dtype)

    def kernel(off_ref, x_ref, w_ref, ws_ref, bias_ref,
               ck_ref, ks_ref, cv_ref, vs_ref, kc_ref, vc_ref,
               y_ref, nk_ref, nv_ref,
               resid, xq8, xs_v, qbuf, kbuf, vbuf, q2buf, abuf, cabuf,
               h, hq8, hs_v, csc):
        lyr = pl.program_id(0)
        c = pl.program_id(1)
        b0 = bias_ref[0]

        def quantize_rows(x):
            """Per-ROW dynamic int8 quantization of all 8 activation rows
            (each lane gets its own scale; dead rows quantize harmlessly
            to whatever their garbage is — their outputs are ignored)."""
            s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                            / 127.0, 1e-12)                      # [8, 1]
            xq8[:] = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
            xs_v[:] = s

        def layer_norm(x, wrow, brow):
            mean = jnp.mean(x, axis=-1, keepdims=True)
            zero = x - mean
            var = jnp.mean(zero * zero, axis=-1, keepdims=True)
            y = zero * jax.lax.rsqrt(var + 1e-5)
            return y * b0[wrow:wrow + 1, :] + b0[brow:brow + 1, :]

        def gemv_chunk():
            """xq8 [8, d] @ chunk [CH, d].T -> [8, CH], per-row rescale."""
            acc = jax.lax.dot_general(
                xq8[:], w_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * ws_ref[0, 0] * xs_v[:]

        # ---- self-attention projections -------------------------------
        @pl.when(c == C_Q)
        def _():
            @pl.when(lyr == 0)
            def _():
                resid[:] = x_ref[:]
            quantize_rows(layer_norm(resid[:], 0, 1))

        for c0, buf, brow in ((C_Q, qbuf, 2), (C_K, kbuf, -1),
                              (C_V, vbuf, 3)):
            for j in range(NW):
                @pl.when(c == c0 + j)
                def _(buf=buf, j=j, brow=brow):
                    out = gemv_chunk()
                    if brow >= 0:
                        out = out + b0[brow:brow + 1, j * CH:(j + 1) * CH]
                    buf[:, j * CH:(j + 1) * CH] = out

        # ---- per-lane self-attention (one lane per grid step) ----------
        @pl.when((c >= C_SA) & (c < C_SA + n))
        def _():
            m = c - C_SA
            off = off_ref[0, m]
            hh = hsum()
            hht = hsum_t()
            qrow = qbuf[pl.ds(m, 1), :] * sm
            krow = kbuf[pl.ds(m, 1), :]
            vrow = vbuf[pl.ds(m, 1), :]
            nsub = s_max // SUB

            def score_tile(i, _):
                kk = kc_ref[0, 0, pl.ds(i * SUB, SUB), :].astype(
                    jnp.float32)
                sc = jnp.dot(kk * qrow, hh,
                             preferred_element_type=jnp.float32)
                csc[pl.ds(i * SUB, SUB), :] = sc
                return 0

            jax.lax.fori_loop(0, nsub, score_tile, 0)
            sc_cur = jnp.dot(krow * qrow, hh,
                             preferred_element_type=jnp.float32)
            pos = jax.lax.broadcasted_iota(jnp.int32, (s_max, 128), 0)
            sc = csc[0:s_max, :]
            sc = jnp.where(pos == off, jnp.broadcast_to(sc_cur, sc.shape),
                           sc)
            valid = pos <= off
            sc = jnp.where(valid, sc, -1e9)
            mx = jnp.max(sc, axis=0, keepdims=True)
            p = jnp.where(valid, jnp.exp(sc - mx), 0.0)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            csc[0:s_max, :] = p

            def pv_tile(i, acc):
                pr = csc[pl.ds(i * SUB, SUB), :]
                pexp = jnp.dot(pr, hht, preferred_element_type=jnp.float32)
                vv = vc_ref[0, 0, pl.ds(i * SUB, SUB), :].astype(
                    jnp.float32)
                rpos = (jax.lax.broadcasted_iota(jnp.int32, (SUB, d), 0)
                        + i * SUB)
                vv = jnp.where(rpos == off,
                               jnp.broadcast_to(vrow, vv.shape), vv)
                return acc + jnp.sum(pexp * vv, axis=0, keepdims=True)

            av = jax.lax.fori_loop(0, nsub, pv_tile,
                                   jnp.zeros((1, d), jnp.float32))
            abuf[pl.ds(m, 1), :] = av

            @pl.when(m == n - 1)
            def _():
                nk_ref[0] = kbuf[:]
                nv_ref[0] = vbuf[:]
                quantize_rows(abuf[:])

        for j in range(NW):
            @pl.when(c == C_O + j)
            def _(j=j):
                resid[:, j * CH:(j + 1) * CH] = (
                    resid[:, j * CH:(j + 1) * CH] + gemv_chunk()
                    + b0[4:5, j * CH:(j + 1) * CH])

        # ---- cross-attention (lane-major chunked timeline) -------------
        @pl.when(c == C_CQ)
        def _():
            quantize_rows(layer_norm(resid[:], 5, 6))

        for j in range(NW):
            @pl.when(c == C_CQ + j)
            def _(j=j):
                q2buf[:, j * CH:(j + 1) * CH] = (
                    gemv_chunk() + b0[7:8, j * CH:(j + 1) * CH])

        @pl.when((c >= C_X) & (c < C_CO))
        def _():
            t = c - C_X
            m = t // (2 * NC)
            phase = t % (2 * NC)
            hh = hsum()
            hht = hsum_t()
            nsub = CC // SUB

            @pl.when(phase < NC)
            def _():
                # score chunk ``phase`` for lane m
                q2row = q2buf[pl.ds(m, 1), :] * sm

                def tile(i, _):
                    kk = ck_ref[0, 0, pl.ds(i * SUB, SUB), :].astype(
                        jnp.float32)
                    csc[pl.ds(phase * CC + i * SUB, SUB), :] = jnp.dot(
                        kk * q2row, hh, preferred_element_type=jnp.float32)
                    return 0

                jax.lax.fori_loop(0, nsub, tile, 0)
                csc[pl.ds(phase * CC, CC), :] = (
                    csc[pl.ds(phase * CC, CC), :]
                    * ks_ref[0, 0, 0, 0].reshape(CC, 1))

            @pl.when(phase >= NC)
            def _():
                @pl.when(phase == NC)
                def _():
                    # lane m's scores are complete: masked softmax + zero
                    # its accumulator row
                    pos = jax.lax.broadcasted_iota(
                        jnp.int32, (s_pad, 128), 0)
                    valid = pos < s_src
                    sc = jnp.where(valid, csc[0:s_pad, :], -1e9)
                    mx = jnp.max(sc, axis=0, keepdims=True)
                    pr = jnp.where(valid, jnp.exp(sc - mx), 0.0)
                    csc[0:s_pad, :] = pr / jnp.sum(pr, axis=0,
                                                   keepdims=True)
                    cabuf[pl.ds(m, 1), :] = jnp.zeros((1, d), jnp.float32)

                j = phase - NC
                csc[pl.ds(j * CC, CC), :] = (
                    csc[pl.ds(j * CC, CC), :]
                    * vs_ref[0, 0, 0, 0].reshape(CC, 1))

                def tile(i, acc):
                    pr = csc[pl.ds(j * CC + i * SUB, SUB), :]
                    pexp = jnp.dot(pr, hht,
                                   preferred_element_type=jnp.float32)
                    vv = cv_ref[0, 0, pl.ds(i * SUB, SUB), :].astype(
                        jnp.float32)
                    return acc + jnp.sum(pexp * vv, axis=0, keepdims=True)

                av = jax.lax.fori_loop(0, nsub, tile,
                                       jnp.zeros((1, d), jnp.float32))
                cabuf[pl.ds(m, 1), :] = cabuf[pl.ds(m, 1), :] + av

        @pl.when(c == C_CO)
        def _():
            quantize_rows(cabuf[:])

        for j in range(NW):
            @pl.when(c == C_CO + j)
            def _(j=j):
                resid[:, j * CH:(j + 1) * CH] = (
                    resid[:, j * CH:(j + 1) * CH] + gemv_chunk()
                    + b0[8:9, j * CH:(j + 1) * CH])

        # ---- MLP --------------------------------------------------------
        @pl.when(c == C_F1)
        def _():
            quantize_rows(layer_norm(resid[:], 9, 10))

        for j in range(n_fc):
            @pl.when(c == C_F1 + j)
            def _(j=j):
                brow = 13 + (j * CH) // d
                bcol = (j * CH) % d
                out = gemv_chunk() + b0[brow:brow + 1, bcol:bcol + CH]
                h[:, j * CH:(j + 1) * CH] = jax.nn.gelu(out,
                                                        approximate=True)

        @pl.when(c == C_F2)
        def _():
            hf = h[:]
            s = jnp.maximum(jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
                            / 127.0, 1e-12)
            hq8[:] = jnp.clip(jnp.round(hf / s), -127, 127).astype(jnp.int8)
            hs_v[:] = s

        for j in range(n_fc):
            @pl.when(c == C_F2 + j)
            def _(j=j):
                acc = jax.lax.dot_general(
                    hq8[:, j * CH:(j + 1) * CH], w_ref[0],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)         # [8, d]
                upd = acc.astype(jnp.float32) * b0[12:13, :] * hs_v[:]
                if j == n_fc - 1:
                    upd = upd + b0[11:12, :]
                resid[:] = resid[:] + upd

        @pl.when((lyr == L - 1) & (c == STEPS - 1))
        def _():
            y_ref[:] = resid[:]

    # ---- index maps -------------------------------------------------------
    # weight chunk: q/k/v = chunks 0..5, o/cq = 6..9, co.. = 10..; pinned
    # to the upcoming chunk while the per-lane attention steps run
    def w_chunk(c):
        return jnp.where(
            c < C_SA, c,
            jnp.where(c < C_X, jnp.clip(c - n, 3 * NW, 5 * NW - 1),
                      jnp.where(c < C_CO, 5 * NW, c - n - 2 * n * NC)))

    def w_idx(l, c):
        return (l, w_chunk(c), 0)

    def ws_idx(l, c):
        return (l, w_chunk(c), 0, 0)

    # per-lane self cache: pinned to the upcoming lane's block
    def sa_lane(c):
        return jnp.clip(c - C_SA, 0, n - 1)

    def kc_idx(l, c):
        return (sa_lane(c), l, 0, 0)

    # per-lane cross streams (lane-major, NC score chunks then NC PV).
    # Clamp c into the cross WINDOW before the div/mod: outside it the
    # raw modulo would cycle the block index every grid step and
    # re-fetch [CC, d] cross chunks the step never reads (review r5 —
    # at large-v3 n=8 that spurious traffic would roughly double the
    # kernel's HBM bytes); clamped, the blocks stay pinned.
    def _xw(c):
        return jnp.clip(c - C_X, 0, n * 2 * NC - 1)

    def x_lane(c):
        return _xw(c) // (2 * NC)

    def ck_chunk(c):
        return jnp.clip(_xw(c) % (2 * NC), 0, NC - 1)

    def cv_chunk(c):
        return jnp.clip(_xw(c) % (2 * NC) - NC, 0, NC - 1)

    def ck_idx(l, c):
        return (x_lane(c), l, ck_chunk(c), 0)

    def cks_idx(l, c):
        return (x_lane(c), l, ck_chunk(c), 0, 0)

    def cv_idx(l, c):
        return (x_lane(c), l, cv_chunk(c), 0)

    def cvs_idx(l, c):
        return (x_lane(c), l, cv_chunk(c), 0, 0)

    return kernel, STEPS, (CH, CC), dict(
        w_idx=w_idx, ws_idx=ws_idx, kc_idx=kc_idx, ck_idx=ck_idx,
        cks_idx=cks_idx, cv_idx=cv_idx, cvs_idx=cvs_idx)


def fused_stack_lanes(pack: FusedPack, ck, ks, cv, vs, kcache, vcache,
                      x, offsets, *, cfg, s_src: int,
                      interpret: bool = False, ch: int | None = None):
    """Run the full decoder layer stack for ONE token on EACH of n lanes.

    x: [8, d] f32 — rows 0..n-1 are the n lanes' embedded tokens (+
    positional rows), rows n..7 dead; kcache/vcache: [n, L, S_max, d]
    bf16 position-major per-lane self caches (lane-major, the stacking
    order of parallel/continuous.py); ck/cv + ks/vs: per-lane packed
    cross K/V ([n, L, Sp, d] int8 / [n, L, Sp] f32); offsets: [8] int32
    per-lane write positions (rows >= n ignored).
    Returns (y [8, d] f32, newk [L, 8, d] f32, newv [L, 8, d] f32) —
    column m of newk/newv is lane m's new self K/V row, to scatter at
    ``offsets[m]``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = cfg.d_model
    L = cfg.decoder_layers
    ffn = cfg.decoder_ffn_dim
    n, _, s_max, _ = kcache.shape
    s_pad = ck.shape[2]
    assert s_max % SUB == 0 and s_pad % SUB == 0 and 1 <= n <= 8

    kernel, STEPS, (CH, CC), idx = _build_kernel_lanes(
        d=d, heads=cfg.decoder_attention_heads, ffn=ffn, s_max=s_max,
        s_src=s_src, s_pad=s_pad, L=L, n=n,
        ch=(d if ch is None else ch))

    NC = s_pad // CC
    grid = (L, STEPS)
    out_shapes = (
        jax.ShapeDtypeStruct((8, d), jnp.float32),
        jax.ShapeDtypeStruct((L, 8, d), jnp.float32),
        jax.ShapeDtypeStruct((L, 8, d), jnp.float32),
    )
    y, nk, nv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda l, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, d), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, d), idx["w_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, CH), idx["ws_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack.biaspack.shape[1], d),
                         lambda l, c: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CC, d), idx["ck_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, CC), idx["cks_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CC, d), idx["cv_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, CC), idx["cvs_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_max, d), idx["kc_idx"],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_max, d), idx["kc_idx"],
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, d), lambda l, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, d), lambda l, c: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((8, d), jnp.float32),      # resid
            pltpu.VMEM((8, d), jnp.int8),          # xq8
            pltpu.VMEM((8, 1), jnp.float32),       # xs_v (per-row scales)
            pltpu.VMEM((8, d), jnp.float32),       # qbuf
            pltpu.VMEM((8, d), jnp.float32),       # kbuf
            pltpu.VMEM((8, d), jnp.float32),       # vbuf
            pltpu.VMEM((8, d), jnp.float32),       # q2buf
            pltpu.VMEM((8, d), jnp.float32),       # abuf (self-attn out)
            pltpu.VMEM((8, d), jnp.float32),       # cabuf (cross out)
            pltpu.VMEM((8, ffn), jnp.float32),     # h
            pltpu.VMEM((8, ffn), jnp.int8),        # hq8
            pltpu.VMEM((8, 1), jnp.float32),       # hs_v
            pltpu.VMEM((max(s_max, s_pad), 128), jnp.float32),  # csc
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * 14 * d * d * L,
            bytes_accessed=(pack.wstream.size + ck.size + cv.size
                            + kcache.size * 2 + vcache.size * 2),
            transcendentals=8 * ffn * L,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(offsets, jnp.int32).reshape(1, 8), x,
      pack.wstream, pack.row_scales.reshape(L, -1, 1, CH), pack.biaspack,
      ck, ks.reshape(n, L, NC, 1, CC), cv, vs.reshape(n, L, NC, 1, CC),
      kcache, vcache)
    return y, nk, nv
