"""Functional neural-net layers over parameter pytrees.

The TPU-native replacement for the reference's MLXNN ``Module`` tree: models
here are pure functions ``f(params, x)`` over nested dicts whose keys mirror
the sanitized checkpoint names, so `jax.jit` traces whole models with
parameters as ordinary pytree arguments and HF loading is a dict transform.

Weight layout conventions follow the checkpoints (torch): Linear ``weight``
is ``[out, in]``; Conv1d ``weight`` is ``[out, in/groups, k]``;
ConvTranspose1d ``weight`` is ``[in, out/groups, k]``. Activations are
channels-last ``[batch, length, channels]`` so the feature dim rides the MXU
lanes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tpu_audio.core import quant

__all__ = [
    "linear", "embedding", "layer_norm", "rms_norm", "group_norm",
    "conv1d", "conv_transpose1d", "conv2d",
    "gelu", "silu", "snake", "mish",
    "rope", "apply_rope", "sdpa",
    "lstm", "gru",
]


# ---------------------------------------------------------------------------
# Dense / embedding / norms
# ---------------------------------------------------------------------------


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """``x @ W.T + b``; transparently handles MLX-quantized weights
    (as :class:`quant.QuantizedTensor` nodes tagged at load time)."""
    w = p["weight"]
    if isinstance(w, quant.Int8Tensor):
        y = quant.int8_matmul(x, w)
    elif isinstance(w, quant.QuantizedTensor):
        y = quant.quantized_matmul_qt(x, w).astype(x.dtype)
    else:
        y = x @ w.T.astype(x.dtype) if w.dtype != x.dtype else x @ w.T
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def embedding(p: dict, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Token embedding lookup; packed tables gather the *rows* first and
    dequantize only those (dequantizing the whole 100k+-row table per
    decode step would re-materialize it in HBM every token)."""
    w = p["weight"]
    if isinstance(w, quant.Int8Tensor):
        flat = ids.reshape(-1)
        d = (w.weight[flat].astype(dtype)
             * w.scale[flat][:, None].astype(dtype))
        return d.reshape(*ids.shape, d.shape[-1])
    if isinstance(w, quant.QuantizedTensor):
        flat = ids.reshape(-1)
        rows = quant.QuantizedTensor(
            w.weight[flat], w.scales[flat], w.biases[flat],
            group_size=w.group_size, bits=w.bits)
        d = rows.dequantize(dtype)
        return d.reshape(*ids.shape, d.shape[-1])
    return w[ids]


def embedding_as_linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Tied-embedding output head: ``x @ E.T``."""
    w = p["weight"]
    if isinstance(w, quant.Int8Tensor):
        return quant.int8_matmul(x, w)
    if isinstance(w, quant.QuantizedTensor):
        return quant.quantized_matmul_qt(x, w).astype(x.dtype)
    return x @ w.T.astype(x.dtype)


def layer_norm(p: dict | None, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        if "weight" in p:
            y = y * p["weight"].astype(jnp.float32)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(p: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt((xf * xf).mean(-1, keepdims=True) + eps)
    return (y * p["weight"].astype(jnp.float32)).astype(x.dtype)


def batch_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm over channels-last ``[..., C]``."""
    mean = p["running_mean"].astype(jnp.float32)
    var = p["running_var"].astype(jnp.float32)
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    if "weight" in p:
        y = y * p["weight"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def lstm_cell(p: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """Single LSTM step: x [B, I], h/c [B, H] -> (h, c). Torch gate order."""
    w_ih = p["weight_ih_l0"] if "weight_ih_l0" in p else p["weight_ih"]
    w_hh = p["weight_hh_l0"] if "weight_hh_l0" in p else p["weight_hh"]
    gates = x @ w_ih.T.astype(x.dtype) + h @ w_hh.T.astype(x.dtype)
    b_ih = p.get("bias_ih_l0", p.get("bias_ih"))
    b_hh = p.get("bias_hh_l0", p.get("bias_hh"))
    if b_ih is not None:
        gates = gates + (b_ih if b_hh is None else b_ih + b_hh).astype(x.dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def group_norm(p: dict | None, x: jnp.ndarray, num_groups: int,
               eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channels-last ``[..., C]``."""
    *lead, c = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, num_groups, c // num_groups)
    axes = tuple(range(1, len(lead))) + (len(lead) + 1,)
    mean = xf.mean(axis=axes, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=axes, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(*lead, c)
    if p is not None:
        if "weight" in p:
            y = y * p["weight"].astype(jnp.float32)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Convolutions (channels-last activations, torch-layout weights)
# ---------------------------------------------------------------------------


def conv1d(p: dict, x: jnp.ndarray, stride: int = 1, padding: int | tuple = 0,
           dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """1D conv on ``[B, L, C_in]`` with torch-layout ``weight [O, I/g, K]``."""
    if isinstance(padding, int):
        padding = (padding, padding)
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NLC", "OIL", "NLC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv_transpose1d(p: dict, x: jnp.ndarray, stride: int = 1,
                     padding: int = 0, output_padding: int = 0,
                     groups: int = 1) -> jnp.ndarray:
    """1D transposed conv on ``[B, L, C_in]`` with torch-layout
    ``weight [I, O/g, K]`` (torch ConvTranspose1d semantics: output length =
    (L-1)*stride - 2*padding + K + output_padding)."""
    w = p["weight"].astype(x.dtype)  # [I, O/g, K]
    k = w.shape[-1]
    if groups != 1:
        # grouped transposed conv: block-diagonal expansion is wasteful; use
        # per-group slices instead
        in_per_g = x.shape[-1] // groups
        outs = []
        for g in range(groups):
            pg = {"weight": w[g * in_per_g : (g + 1) * in_per_g]}
            outs.append(conv_transpose1d(pg, x[..., g * in_per_g : (g + 1) * in_per_g],
                                         stride, padding, output_padding))
        y = jnp.concatenate(outs, axis=-1)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y
    # lax transposed conv = lhs-dilated conv with flipped kernel
    w_flip = jnp.flip(w, axis=-1)  # [I, O, K]
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x, w_flip,
        window_strides=(1,),
        padding=((pad_lo, pad_hi),),
        lhs_dilation=(stride,),
        dimension_numbers=("NLC", "IOL", "NLC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv2d(p: dict, x: jnp.ndarray, stride=(1, 1), padding=(0, 0),
           dilation=(1, 1), groups: int = 1) -> jnp.ndarray:
    """2D conv on ``[B, H, W, C_in]`` with torch-layout ``weight [O, I/g, Kh, Kw]``."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = tuple((pp, pp) if isinstance(pp, int) else pp for pp in padding)
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def gelu(x, approximate: bool = False):
    return jax.nn.gelu(x, approximate=approximate)


def silu(x):
    return jax.nn.silu(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def snake(x, alpha, logscale: bool = False):
    """Snake activation x + sin^2(ax)/a (BigVGAN/DAC vocoders —
    reference BigVGAN.swift snake blocks, OmniVoice.swift:1115 SnakeAlpha)."""
    a = jnp.exp(alpha) if logscale else alpha
    return x + (jnp.sin(a * x) ** 2) / (a + 1e-9)


# ---------------------------------------------------------------------------
# Rotary position embeddings
# ---------------------------------------------------------------------------


def rope_freqs(head_dim: int, base: float = 10000.0,
               llama3_scaling: dict | None = None) -> jnp.ndarray:
    """Inverse frequencies [head_dim/2]; optional Llama-3 NTK scaling
    (reference LlamaTTS.swift:104 Llama3-scaled RoPE)."""
    inv = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if llama3_scaling:
        factor = llama3_scaling.get("factor", 8.0)
        low_factor = llama3_scaling.get("low_freq_factor", 1.0)
        high_factor = llama3_scaling.get("high_freq_factor", 4.0)
        old_len = llama3_scaling.get("original_max_position_embeddings", 8192)
        low_wl = old_len / low_factor
        high_wl = old_len / high_factor
        wl = 2 * math.pi / inv
        smooth = (old_len / wl - low_factor) / (high_factor - low_factor)
        scaled = jnp.where(
            wl < high_wl,
            inv,
            jnp.where(
                wl > low_wl,
                inv / factor,
                (1 - smooth) * inv / factor + smooth * inv,
            ),
        )
        return scaled
    return inv


def rope(positions: jnp.ndarray, head_dim: int, base: float = 10000.0,
         inv_freq: jnp.ndarray | None = None):
    """cos/sin tables for positions ``[...]`` -> each ``[..., head_dim/2]``."""
    if inv_freq is None:
        inv_freq = rope_freqs(head_dim, base)
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               interleaved: bool = False) -> jnp.ndarray:
    """Rotate ``x [B, H, S, D]`` with cos/sin ``[S, D/2]`` (or broadcastable).

    ``interleaved=False`` is the HF/Llama "half split" convention;
    ``interleaved=True`` is the GPT-NeoX/original pairing.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if interleaved:
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    else:
        half = x.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         mask: jnp.ndarray | None = None, scale: float | None = None,
         is_causal: bool = False) -> jnp.ndarray:
    """Scaled dot-product attention over ``[B, H, S, D]`` with GQA support
    (the TPU stand-in for MLXFast.scaledDotProductAttention,
    LlamaTTS.swift:257). Softmax in fp32 for stability; XLA fuses the chain.
    """
    b, n_heads, s_q, d = q.shape
    n_kv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    # Large-finite masking (not -inf): fully-masked rows (left padding) must
    # produce finite garbage rather than NaN, which would otherwise poison
    # downstream KV entries via 0 * NaN in the value contraction.
    neg = jnp.asarray(-1e9, jnp.float32)
    if n_kv != n_heads:
        # GQA via a grouped einsum on [B, G, rep, S, D] — no materialized
        # jnp.repeat of the (cache-sized) K/V, which on a 28-layer decode
        # step would write+read the repeated cache views every token
        rep = n_heads // n_kv
        qg = q.reshape(b, n_kv, rep, s_q, d)
        scores = jnp.einsum("bgrqd,bgkd->bgrqk", qg, k,
                            preferred_element_type=jnp.float32) * scale
        scores = scores.reshape(b, n_heads, s_q, -1)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
    if is_causal:
        s_k = k.shape[2]
        causal = jnp.tril(jnp.ones((s_q, s_k), bool), k=s_k - s_q)
        scores = jnp.where(causal[None, None], scores, neg)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            scores = jnp.where(mask, scores, neg)
        else:
            scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    if n_kv != n_heads:
        pg = probs.reshape(b, n_kv, rep, s_q, -1)
        out = jnp.einsum("bgrqk,bgkd->bgrqd", pg, v)
        return out.reshape(b, n_heads, s_q, d)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Recurrent layers (lax.scan) — Parakeet/Silero/Kokoro/Encodec need these
# ---------------------------------------------------------------------------


def lstm(p: dict, x: jnp.ndarray, h0=None, c0=None):
    """Single-layer LSTM over ``[B, T, I]`` with torch param names
    (weight_ih_l0/weight_hh_l0/bias_*). Returns (outputs [B,T,H], (h, c)).

    The input projection for all timesteps is one big MXU matmul hoisted out
    of the scan; only the hidden recurrence is sequential.
    """
    w_ih = p["weight_ih_l0"] if "weight_ih_l0" in p else p["weight_ih"]
    w_hh = p["weight_hh_l0"] if "weight_hh_l0" in p else p["weight_hh"]
    b = None
    if "bias_ih_l0" in p or "bias_ih" in p:
        b_ih = p.get("bias_ih_l0", p.get("bias_ih"))
        b_hh = p.get("bias_hh_l0", p.get("bias_hh"))
        b = b_ih if b_hh is None else b_ih + b_hh  # MLX LSTMs have one bias
        b = b.astype(x.dtype)
    hidden = w_hh.shape[1]
    bsz = x.shape[0]
    x_proj = x @ w_ih.T.astype(x.dtype)  # [B, T, 4H]
    if b is not None:
        x_proj = x_proj + b
    if h0 is None:
        h0 = jnp.zeros((bsz, hidden), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((bsz, hidden), x.dtype)
    w_hh_t = w_hh.T.astype(x.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h, c), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), (h, c)


def gru(p: dict, x: jnp.ndarray, h0=None):
    """Single-layer GRU over ``[B, T, I]`` with torch param names / gate
    order (r, z, n). Returns (outputs [B,T,H], h)."""
    w_ih = p["weight_ih_l0"] if "weight_ih_l0" in p else p["weight_ih"]
    w_hh = p["weight_hh_l0"] if "weight_hh_l0" in p else p["weight_hh"]
    b_ih = p.get("bias_ih_l0", p.get("bias_ih"))
    b_hh = p.get("bias_hh_l0", p.get("bias_hh"))
    hidden = w_hh.shape[1]
    bsz = x.shape[0]
    x_proj = x @ w_ih.T.astype(x.dtype)
    if b_ih is not None:
        x_proj = x_proj + b_ih.astype(x.dtype)
    if h0 is None:
        h0 = jnp.zeros((bsz, hidden), x.dtype)
    w_hh_t = w_hh.T.astype(x.dtype)
    b_hh = None if b_hh is None else b_hh.astype(x.dtype)

    def step(h, xt):
        h_proj = h @ w_hh_t
        if b_hh is not None:
            h_proj = h_proj + b_hh
        xr, xz, xn = jnp.split(xt, 3, axis=-1)
        hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1 - z) * n + z * h
        return h, h

    if x.shape[1] == 1:
        # single-step fast path: a T=1 lax.scan still pays while-loop
        # setup (~ms-level on tunneled TPU backends); streaming steppers
        # (e.g. the DeepFilterNet hop streamer) call this per hop
        h, _ = step(h0, x_proj[:, 0])
        return h[:, None], h
    h, ys = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h
