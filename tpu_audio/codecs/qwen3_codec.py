"""Qwen3-TTS speech tokenizer decoder: split-RVQ -> causal-conv/transformer
token-to-waveform stack with true streaming decode.

TPU-first rebuild of the reference
(Sources/MLXAudioTTS/Models/Qwen3TTS/Qwen3TTSSpeechTokenizer.swift):
SplitResidualVectorQuantizer decode (:91-120), causal convolutions with
stream buffers (:132-234), SnakeBeta (:236-253), ConvNeXt upsample blocks
(:257-298, :751-789), a pre-transformer with layer-scale and rope (:352-503),
and the BigVGAN-style causal decoder stack (:505-720) with
``streamingStep`` incremental decode (:979-1050).

TPU design: streaming state is an explicit fixed-shape pytree (zero-filled
conv history buffers + transposed-conv overlap tails + a KV cache), so the
whole ``streaming_step(chunk)`` is ONE jitted graph per chunk size — the
reference mutates module-held optional buffers host-side instead.
Activations are channels-last [B, T, C].
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import kv_cache, nn

__all__ = ["Qwen3CodecDecoderConfig", "Qwen3CodecDecoder"]


@dataclass
class Qwen3CodecDecoderConfig:
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    head_dim: int = 64
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 8000
    attention_bias: bool = False
    latent_dim: int = 1024
    codebook_dim: int = 512
    codebook_size: int = 2048
    decoder_dim: int = 1536
    num_quantizers: int = 16
    num_semantic_quantizers: int = 1
    upsample_rates: tuple = (8, 5, 4, 3)
    upsampling_ratios: tuple = (2, 2)
    layer_scale_initial_scale: float = 0.01
    sampling_rate: int = 24000

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates)) * int(np.prod(self.upsampling_ratios))

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen3CodecDecoderConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("upsample_rates", "upsampling_ratios"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


# ---------------------------------------------------------------------------
# RVQ decode
# ---------------------------------------------------------------------------


def _codebook_embed(p: dict) -> jnp.ndarray:
    if "embed" in p:
        return p["embed"]
    if "embedding" in p:
        return p["embedding"]
    # EMA codebooks store sums + usage counts
    return p["embedding_sum"] / jnp.maximum(p["cluster_usage"], 1e-5)[:, None]


def _rvq_decode(p, codes, n_q: int):
    """codes [B, n_q, T] -> latent [B, T, dim] for one ResidualVectorQuantizer
    (input/output 1x1 conv projections in torch layout)."""
    total = None
    for i in range(n_q):
        lp = p["vq"]["layers"][str(i)]
        emb = _codebook_embed(lp["codebook"])[codes[:, i]]  # [B, T, cb_dim]
        if "project_out" in lp:
            emb = nn.linear(lp["project_out"], emb)
        total = emb if total is None else total + emb
    if "output_proj" in p:
        total = nn.conv1d(p["output_proj"], total)
    return total


def quantizer_decode(p, codes, cfg: Qwen3CodecDecoderConfig):
    """Split RVQ: first n_semantic quantizers + the rest
    (SplitResidualVectorQuantizer.decode)."""
    ns = cfg.num_semantic_quantizers
    out = _rvq_decode(p["rvq_first"], codes[:, :ns], ns)
    if codes.shape[1] > ns:
        out = out + _rvq_decode(p["rvq_rest"], codes[:, ns:], codes.shape[1] - ns)
    return out  # [B, T, codebook_dim]


# ---------------------------------------------------------------------------
# Causal conv primitives with explicit stream state
# ---------------------------------------------------------------------------


def causal_conv(p, x, kernel: int, dilation: int = 1, groups: int = 1):
    """Full-sequence causal conv on [B, T, C] (left pad = k_eff - 1)."""
    pad = (kernel - 1) * dilation
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    return nn.conv1d(p, x, dilation=dilation, groups=groups)


def causal_conv_step(p, x, buf, kernel: int, dilation: int = 1, groups: int = 1):
    """Streaming causal conv: ``buf`` holds the last ``(k-1)*d`` inputs."""
    h = jnp.concatenate([buf, x], axis=1)
    y = nn.conv1d(p, h, dilation=dilation, groups=groups)
    pad = (kernel - 1) * dilation
    new_buf = h[:, h.shape[1] - pad:]
    return y, new_buf


def causal_conv_state(batch: int, channels: int, kernel: int,
                      dilation: int = 1, dtype=jnp.float32):
    return jnp.zeros((batch, (kernel - 1) * dilation, channels), dtype)


def causal_convt(p, x, kernel: int, stride: int):
    """Causal transposed conv: full conv then trim ``k - stride`` from the
    right (CausalTransposeConv1d)."""
    y = nn.conv_transpose1d(p, x, stride=stride, padding=0)
    trim = kernel - stride
    return y[:, : y.shape[1] - trim] if trim > 0 else y


def causal_convt_step(p, x, overflow, kernel: int, stride: int):
    """Streaming transposed conv with overlap-add tail carry
    (DecoderBlockUpsample.step). The carried tail excludes the bias so the
    overlap positions don't count it twice — exact parity with the
    full-sequence decode (the reference's step carries the biased tail,
    DecoderBlockUpsample.step, which drifts when bias != 0)."""
    y = nn.conv_transpose1d(p, x, stride=stride, padding=0)  # [B, t*s + trim, C]
    trim = kernel - stride
    if trim == 0:
        return y, overflow
    y = y.at[:, : overflow.shape[1]].add(overflow)
    emit = y[:, : y.shape[1] - trim]
    new_overflow = y[:, y.shape[1] - trim:]
    if "bias" in p:
        new_overflow = new_overflow - p["bias"].astype(y.dtype)
    return emit, new_overflow


def snake_beta(p, x):
    """x + sin^2(x * e^alpha) / (e^beta + eps), per channel (SnakeBeta)."""
    a = jnp.exp(p["alpha"]).astype(x.dtype)
    b = jnp.exp(p["beta"]).astype(x.dtype)
    s = jnp.sin(x * a)
    return x + (1.0 / (b + 1e-9)) * s * s


# ---------------------------------------------------------------------------
# ConvNeXt + upsample layers
# ---------------------------------------------------------------------------


def _convnext(p, x, state=None):
    res = x
    if state is None:
        h = causal_conv(p["dwconv"]["conv"], x, 7, groups=x.shape[-1])
    else:
        h, state = causal_conv_step(p["dwconv"]["conv"], x, state, 7,
                                    groups=x.shape[-1])
    h = nn.layer_norm(p["norm"], h, eps=1e-6)
    h = nn.gelu(nn.linear(p["pwconv1"], h))
    h = p["gamma"].astype(h.dtype) * nn.linear(p["pwconv2"], h)
    return res + h, state


def _residual_unit(p, x, dilation: int, state=None):
    h = snake_beta(p["act1"], x)
    if state is None:
        h = causal_conv(p["conv1"]["conv"], h, 7, dilation=dilation)
        h = snake_beta(p["act2"], h)
        h = causal_conv(p["conv2"]["conv"], h, 1)
        return x + h, None
    s1, s2 = state
    h, s1 = causal_conv_step(p["conv1"]["conv"], h, s1, 7, dilation=dilation)
    h = snake_beta(p["act2"], h)
    h = causal_conv(p["conv2"]["conv"], h, 1)  # k=1: stateless
    return x + h, (s1, s2)


# ---------------------------------------------------------------------------
# Pre-transformer (DecoderTransformer)
# ---------------------------------------------------------------------------


def _decoder_transformer(p, x, cfg: Qwen3CodecDecoderConfig, cache=None):
    h = nn.linear(p["input_proj"], x)
    b, t, _ = h.shape
    offset = cache.offset if cache is not None else 0
    positions = offset + jnp.arange(t)
    cos, sin = nn.rope(positions, cfg.head_dim, cfg.rope_theta)
    n_heads, n_kv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                         cfg.head_dim)
    scale = p.get("_layer_scale", None)
    for i in range(cfg.num_hidden_layers):
        lp = p["layers"][str(i)]
        hn = nn.rms_norm(lp["input_layernorm"], h, cfg.rms_norm_eps)
        ap = lp["self_attn"]
        q = nn.linear(ap["q_proj"], hn).reshape(b, t, n_heads, hd).transpose(0, 2, 1, 3)
        k = nn.linear(ap["k_proj"], hn).reshape(b, t, n_kv, hd).transpose(0, 2, 1, 3)
        v = nn.linear(ap["v_proj"], hn).reshape(b, t, n_kv, hd).transpose(0, 2, 1, 3)
        q = nn.apply_rope(q, cos, sin)
        k = nn.apply_rope(k, cos, sin)
        if cache is not None:
            cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
            mask = kv_cache.attention_mask(cache, t)
            o = nn.sdpa(q, k_full, v_full, mask=mask)
        else:
            o = nn.sdpa(q, k, v, is_causal=True)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, n_heads * hd)
        o = nn.linear(ap["o_proj"], o)
        h = h + lp["self_attn_layer_scale"]["scale"].astype(h.dtype) * o
        m = nn.rms_norm(lp["post_attention_layernorm"], h, cfg.rms_norm_eps)
        mp = lp["mlp"]
        m = nn.linear(mp["down_proj"],
                      nn.silu(nn.linear(mp["gate_proj"], m)) * nn.linear(mp["up_proj"], m))
        h = h + lp["mlp_layer_scale"]["scale"].astype(h.dtype) * m
    h = nn.rms_norm(p["norm"], h, cfg.rms_norm_eps)
    out = nn.linear(p["output_proj"], h)
    if cache is not None:
        cache = cache._replace(offset=cache.offset + t)
    return out, cache


# ---------------------------------------------------------------------------
# Full decoder
# ---------------------------------------------------------------------------


def decoder_forward(params, codes, cfg: Qwen3CodecDecoderConfig, state=None):
    """codes [B, n_q, T] -> waveform [B, T * total_upsample].

    With ``state`` (from :func:`init_streaming_state`) this is the
    incremental ``streaming_step``; state threads through every causal conv.
    """
    p = params
    streaming = state is not None
    hidden = quantizer_decode(p["quantizer"], codes, cfg)  # [B, T, cb_dim]
    si = 0

    def conv_full_or_step(pp, x, kernel, dilation=1, groups=1):
        nonlocal si
        if not streaming:
            return causal_conv(pp, x, kernel, dilation, groups)
        y, state["convs"][si] = causal_conv_step(
            pp, x, state["convs"][si], kernel, dilation, groups)
        si += 1
        return y

    # NB: streaming conv-state consumption order must match init order below.
    hidden = conv_full_or_step(p["pre_conv"]["conv"], hidden, 3)
    if streaming:
        hidden, state["cache"] = _decoder_transformer(
            p["pre_transformer"], hidden, cfg, state["cache"])
    else:
        hidden, _ = _decoder_transformer(p["pre_transformer"], hidden, cfg)

    # upsample (CausalTransposeConv + ConvNeXt) per ratio
    oi = 0
    for u, factor in enumerate(cfg.upsampling_ratios):
        up = p["upsample"][str(u)]
        hidden = causal_convt(up["conv_t"]["conv"], hidden, factor, factor)
        if streaming:
            hidden, state["convnext"][u] = _convnext(up["convnext"], hidden,
                                                     state["convnext"][u])
        else:
            hidden, _ = _convnext(up["convnext"], hidden)

    # BigVGAN-style decoder stack
    d = p["decoder"]
    wav = conv_full_or_step(d["0"]["conv"], hidden, 7)
    n_blocks = len(cfg.upsample_rates)
    for bidx in range(n_blocks):
        bp = d[str(1 + bidx)]["block"]
        rate = cfg.upsample_rates[bidx]
        wav = snake_beta(bp["0"], wav)
        if streaming:
            wav, state["overflow"][bidx] = causal_convt_step(
                bp["1"]["conv"], wav, state["overflow"][bidx], 2 * rate, rate)
        else:
            wav = causal_convt(bp["1"]["conv"], wav, 2 * rate, rate)
        for j, dil in enumerate((1, 3, 9)):
            rp = bp[str(2 + j)]
            if streaming:
                key = (bidx, j)
                wav, state["resunits"][key] = _residual_unit(
                    rp, wav, dil, state["resunits"][key])
            else:
                wav, _ = _residual_unit(rp, wav, dil)
    wav = snake_beta(d[str(1 + n_blocks)], wav)
    wav = conv_full_or_step(d[str(2 + n_blocks)]["conv"], wav, 7)
    wav = jnp.clip(wav, -1.0, 1.0)[..., 0]  # [B, T_out]
    return (wav, state) if streaming else wav


def init_streaming_state(cfg: Qwen3CodecDecoderConfig, batch: int = 1,
                         max_frames: int = 4096, dtype=jnp.float32):
    """Zero-initialized stream state: conv history buffers, transposed-conv
    overlap tails, ConvNeXt/res-unit buffers, transformer KV cache."""
    convs = [
        causal_conv_state(batch, cfg.codebook_dim, 3, dtype=dtype),  # pre_conv
        causal_conv_state(batch, cfg.latent_dim, 7, dtype=dtype),    # decoder.0
        causal_conv_state(
            batch, cfg.decoder_dim // (1 << len(cfg.upsample_rates)), 7,
            dtype=dtype),                                            # out conv
    ]
    convnext = [causal_conv_state(batch, cfg.latent_dim, 7, dtype=dtype)
                for _ in cfg.upsampling_ratios]
    overflow = [
        jnp.zeros((batch, rate, cfg.decoder_dim // (1 << (i + 1))), dtype)
        for i, rate in enumerate(cfg.upsample_rates)
    ]
    resunits = {}
    for i in range(len(cfg.upsample_rates)):
        dim = cfg.decoder_dim // (1 << (i + 1))
        for j, dil in enumerate((1, 3, 9)):
            resunits[(i, j)] = (
                causal_conv_state(batch, dim, 7, dil, dtype),
                None,
            )
    cache = kv_cache.init_cache(
        cfg.num_hidden_layers, batch, cfg.num_key_value_heads, cfg.head_dim,
        max_frames, dtype,
    )
    return {"convs": convs, "convnext": convnext, "overflow": overflow,
            "resunits": resunits, "cache": cache}


class Qwen3CodecDecoder:
    """Stateful wrapper: offline ``decode`` + chunked ``streaming`` decode."""

    def __init__(self, config: Qwen3CodecDecoderConfig, params,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sampling_rate
        self._decode = jax.jit(
            functools.partial(decoder_forward, cfg=config))
        self._step = jax.jit(
            lambda p, codes, state: decoder_forward(p, codes, config, state))
        self._stream_state = None

    def decode(self, codes) -> jnp.ndarray:
        """codes [B, n_q, T] -> [B, T * upsample]."""
        return self._decode(self.params, jnp.asarray(codes))

    def reset_streaming_state(self, batch: int = 1, max_frames: int = 4096):
        self._stream_state = init_streaming_state(
            self.config, batch, max_frames, self.dtype)

    def streaming_step(self, codes) -> jnp.ndarray:
        if self._stream_state is None:
            self.reset_streaming_state(batch=np.asarray(codes).shape[0])
        wav, self._stream_state = self._step(
            self.params, jnp.asarray(codes), self._stream_state)
        return wav
