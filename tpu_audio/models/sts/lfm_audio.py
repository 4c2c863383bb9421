"""LFM2.5-Audio: speech<->text chat (ASR / TTS / voice chat in one LM).

TPU-first rebuild of the reference
(Sources/MLXAudioSTS/Models/LFMAudio/*): a NeMo-style rel-pos conformer
audio encoder with depthwise-separable 8x subsampling feeds an LFM2 hybrid
backbone (gated short-conv layers + a few full-attention layers,
Transformer.swift:232-454) through an MLP adapter; audio frames are
emitted by a small GQA "depthformer" over 8 RVQ codebooks
(LFMAudioModel.swift:119-150,348-390) and decoded to waveform by a
conv/sliding-window-attention detokenizer with an ISTFT head
(Detokenizer.swift:264-375). Generation interleaves text tokens and audio
frames (generateInterleaved / generateSequential,
LFMAudioModel.swift:394-559).

TPU design deltas: the backbone step, the whole 8-codebook depthformer
frame sample, and the detokenizer are each single jitted graphs; LFM2
conv layers carry fixed-size [B, L_cache-1, H] state pytrees instead of
growing MambaCache buffers.
"""

from __future__ import annotations

import functools
import math
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import dsp, hub, kv_cache, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["LFM2Audio", "LFM2AudioConfig", "MODALITY_TEXT",
           "MODALITY_AUDIO_IN", "MODALITY_AUDIO_OUT"]

MODALITY_TEXT = 1
MODALITY_AUDIO_IN = 2
MODALITY_AUDIO_OUT = 3

AUDIO_START_TOKEN = 128
IM_END_TOKEN = 7
TEXT_END_TOKEN = 130
AUDIO_EOS_TOKEN = 2048


# ---------------------------------------------------------------------------
# Configs (LFMAudioConfig.swift)
# ---------------------------------------------------------------------------


@dataclass
class PreprocessorConfig:
    sample_rate: int = 16000
    normalize: str = "per_feature"
    window_size: float = 0.025
    window_stride: float = 0.01
    features: int = 80
    n_fft: int = 512
    log: bool = True
    dither: float = 0.0
    preemph: float = 0.97

    @property
    def hop_length(self) -> int:
        return int(self.sample_rate * self.window_stride)

    @property
    def win_length(self) -> int:
        return int(self.sample_rate * self.window_size)

    @classmethod
    def from_dict(cls, d: dict) -> "PreprocessorConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class ConformerConfig:
    feat_in: int = 80
    n_layers: int = 17
    d_model: int = 512
    subsampling_factor: int = 8
    subsampling_conv_channels: int = 256
    ff_expansion_factor: int = 4
    n_heads: int = 8
    conv_kernel_size: int = 31

    @classmethod
    def from_dict(cls, d: dict) -> "ConformerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class DepthformerConfig:
    layers: int = 4
    dim: int = 1024
    num_heads: int = 32
    num_kv_heads: int = 8
    tie: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "DepthformerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class LFM2BackboneConfig:
    vocab_size: int = 65536
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    norm_eps: float = 1e-5
    conv_bias: bool = False
    conv_L_cache: int = 3
    block_multiple_of: int = 256
    block_ffn_dim_multiplier: float = 1.0
    block_auto_adjust_ff_dim: bool = True
    block_ff_dim: int | None = None
    full_attn_idxs: list | None = None
    layer_types: list | None = None
    rope_theta: float = 1000000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def attn_idxs(self) -> set:
        if self.full_attn_idxs is not None:
            return set(self.full_attn_idxs)
        if self.layer_types is not None:
            return {i for i, t in enumerate(self.layer_types)
                    if t == "full_attention"}
        return set(range(self.num_hidden_layers))

    def ff_dim(self) -> int:
        dim = self.block_ff_dim or self.hidden_size
        if self.block_auto_adjust_ff_dim:
            dim = int(2 * dim / 3)
            dim = int(self.block_ffn_dim_multiplier * dim)
            m = self.block_multiple_of
            dim = m * ((dim + m - 1) // m)
        return dim

    @classmethod
    def from_dict(cls, d: dict) -> "LFM2BackboneConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class DetokenizerConfig:
    hidden_size: int = 1024
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    layer_types: list = field(default_factory=lambda: ["conv"])
    sliding_window: int = 30
    intermediate_size: int = 4096
    norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    output_size: int = 1026
    num_codebooks: int = 8
    vocab_size: int = 2048
    n_fft: int = 1024
    hop_length: int = 256
    upsample_factor: int = 4

    @classmethod
    def from_dict(cls, d: dict) -> "DetokenizerConfig":
        keys = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in keys})


@dataclass
class LFM2AudioConfig:
    sample_rate: int = 24000
    codebooks: int = 8
    audio_vocab_size: int = 2049
    interleaved_n_text: int = 6
    interleaved_n_audio: int = 12
    preprocessor: PreprocessorConfig = field(
        default_factory=PreprocessorConfig)
    encoder: ConformerConfig = field(default_factory=ConformerConfig)
    lfm: LFM2BackboneConfig = field(default_factory=LFM2BackboneConfig)
    depthformer: DepthformerConfig = field(default_factory=DepthformerConfig)
    detokenizer: DetokenizerConfig = field(
        default_factory=DetokenizerConfig)

    @classmethod
    def from_dict(cls, d: dict) -> "LFM2AudioConfig":
        return cls(
            sample_rate=d.get("sample_rate", 24000),
            codebooks=d.get("codebooks", 8),
            audio_vocab_size=d.get("audio_vocab_size", 2049),
            interleaved_n_text=d.get("interleaved_n_text", 6),
            interleaved_n_audio=d.get("interleaved_n_audio", 12),
            preprocessor=PreprocessorConfig.from_dict(
                d.get("preprocessor") or {}),
            encoder=ConformerConfig.from_dict(d.get("encoder") or {}),
            lfm=LFM2BackboneConfig.from_dict(d.get("lfm") or {}),
            depthformer=DepthformerConfig.from_dict(
                d.get("depthformer") or {}),
            detokenizer=DetokenizerConfig.from_dict(
                d.get("detokenizer") or d.get("audio_detokenizer") or {}))


# ---------------------------------------------------------------------------
# Mel preprocessor (AudioPreprocessor, Processor.swift:9-101)
# ---------------------------------------------------------------------------


def preprocess_audio(audio: np.ndarray, cfg: PreprocessorConfig
                     ) -> np.ndarray:
    """16 kHz waveform -> per-feature-normalized log-mel [T, features]."""
    wf = np.asarray(audio, np.float32).reshape(-1)
    if cfg.preemph > 0:
        wf = np.concatenate([wf[:1], wf[1:] - cfg.preemph * wf[:-1]])
    pad = cfg.n_fft // 2
    padded = np.pad(wf, (pad, pad))
    n_frames = 1 + (len(padded) - cfg.n_fft) // cfg.hop_length
    idx = (np.arange(n_frames)[:, None] * cfg.hop_length
           + np.arange(cfg.n_fft)[None, :])
    window = dsp.hanning_window(cfg.win_length, periodic=False)
    if cfg.win_length < cfg.n_fft:
        left = (cfg.n_fft - cfg.win_length) // 2
        window = np.pad(window, (left,
                                 cfg.n_fft - cfg.win_length - left))
    frames = padded[idx] * window
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    filters = dsp.mel_filters(cfg.sample_rate, cfg.n_fft, cfg.features,
                              f_min=0.0, f_max=cfg.sample_rate / 2,
                              norm="slaney", mel_scale="slaney")
    mel = power @ filters
    if cfg.log:
        mel = np.log(mel + 5.96e-8)
    if cfg.normalize == "per_feature":
        n = min(len(wf) // cfg.hop_length, mel.shape[0])
        valid = mel[:n]
        mean = valid.mean(axis=0, keepdims=True)
        var = ((valid - mean) ** 2).sum(axis=0, keepdims=True) / max(n - 1,
                                                                     1)
        mel = (mel - mean) / (np.sqrt(var) + 1e-5)
    return mel.astype(np.float32)


def audio_token_count(mel_frames: int) -> int:
    """Three stride-2 (k=3, p=1) stages (ChatState.addAudio,
    Processor.swift:162-170)."""
    t = mel_frames
    for _ in range(3):
        t = (t + 2 - 3) // 2 + 1
    return t


# ---------------------------------------------------------------------------
# Conformer encoder (Conformer.swift)
# ---------------------------------------------------------------------------


def _rel_pe(length: int, d_model: int) -> np.ndarray:
    pos = np.arange(length - 1, -length, -1, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d_model))
    pe = np.zeros((2 * length - 1, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def _conformer_rel_attn(p, x, pos_emb, n_heads: int, mask=None):
    b, t, d = x.shape
    hd = d // n_heads
    q = nn.linear(p["q_proj"], x).reshape(b, t, n_heads, hd)
    k = nn.linear(p["k_proj"], x).reshape(b, t, n_heads, hd)
    v = nn.linear(p["v_proj"], x).reshape(b, t, n_heads, hd)
    pe = nn.linear(p["pos_proj"], pos_emb[None]).reshape(1, -1, n_heads, hd)
    q_u = (q + p["pos_bias_u"][None, None]).transpose(0, 2, 1, 3)
    q_v = (q + p["pos_bias_v"][None, None]).transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    pe = pe.transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k)
    bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, pe)
    # rel shift (RelativeMultiHeadAttention.relShift, Conformer.swift:156)
    bsz, h, t1, pos_len = bd.shape
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    bd = bd.reshape(bsz, h, pos_len + 1, t1)[:, :, 1:].reshape(
        bsz, h, t1, pos_len)[..., :t1]
    scores = (ac + bd) / math.sqrt(hd)
    if mask is not None:
        scores = scores + mask
    attn = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return nn.linear(p["out_proj"],
                     o.transpose(0, 2, 1, 3).reshape(b, t, d))


def _conformer_layer(p, x, pos_emb, cfg: ConformerConfig, mask=None):
    def ff(fp, h):
        return nn.linear(fp["linear2"], nn.silu(nn.linear(fp["linear1"],
                                                          h)))

    h = x + 0.5 * ff(p["ff1"], nn.layer_norm(p["ff1_norm"], x))
    h = h + _conformer_rel_attn(p["attn"],
                                nn.layer_norm(p["attn_norm"], h), pos_emb,
                                cfg.n_heads, mask)
    # conv module: pointwise GLU -> depthwise -> BN -> silu -> pointwise
    c = nn.layer_norm(p["conv_norm"], h)
    cp = p["conv"]
    glu = nn.linear(cp["pointwise_conv1"], c)
    a, bgate = jnp.split(glu, 2, axis=-1)
    c = a * jax.nn.sigmoid(bgate)
    c = nn.conv1d(cp["depthwise_conv"], c,
                  padding=(cfg.conv_kernel_size - 1) // 2,
                  groups=cfg.d_model)
    c = nn.silu(nn.batch_norm(cp["norm"], c))
    h = h + nn.linear(cp["pointwise_conv2"], c)
    h = h + 0.5 * ff(p["ff2"], nn.layer_norm(p["ff2_norm"], h))
    return nn.layer_norm(p["final_norm"], h)


def conformer_forward(p, mel, cfg: ConformerConfig):
    """mel [B, T, feat] -> [B, T/8, d_model] (ConformerEncoder,
    Conformer.swift:288-357). Depthwise-separable 8x conv subsampling."""
    h = mel[..., None]  # [B, T, F, 1]
    c = p["pre_encode"]["conv"]
    h = jax.nn.relu(nn.conv2d(c["0"], h, stride=(2, 2), padding=(1, 1)))
    ch = h.shape[-1]
    h = nn.conv2d(c["2"], h, stride=(2, 2), padding=(1, 1), groups=ch)
    h = jax.nn.relu(nn.conv2d(c["3"], h))
    h = nn.conv2d(c["5"], h, stride=(2, 2), padding=(1, 1), groups=ch)
    h = jax.nn.relu(nn.conv2d(c["6"], h))
    b, t, f, chan = h.shape
    h = h.transpose(0, 1, 3, 2).reshape(b, t, chan * f)
    h = nn.linear(p["pre_encode"]["out"], h)
    pos_emb = jnp.asarray(_rel_pe(max(h.shape[1], 1), cfg.d_model),
                          h.dtype)
    for i in range(cfg.n_layers):
        h = _conformer_layer(p["layers"][str(i)], h, pos_emb, cfg)
    return h


def adapter_forward(p, x):
    """AdapterMLP (Conformer.swift:361-386)."""
    if "norm" in p:
        x = nn.layer_norm(p["norm"], x)
    idx = sorted(p["linears"], key=int)
    for i, key in enumerate(idx):
        x = nn.linear(p["linears"][key], x)
        if i < len(idx) - 1:
            x = nn.gelu(x)
    return x


# ---------------------------------------------------------------------------
# LFM2 hybrid backbone (Transformer.swift:232-454)
# ---------------------------------------------------------------------------


def lfm2_make_cache(cfg: LFM2BackboneConfig, batch: int, max_len: int,
                    dtype=jnp.float32):
    caches = []
    for i in range(cfg.num_hidden_layers):
        if i in cfg.attn_idxs:
            caches.append(kv_cache.init_cache(
                1, batch, cfg.num_key_value_heads, cfg.head_dim, max_len,
                dtype))
        else:
            caches.append(jnp.zeros((batch, cfg.conv_L_cache - 1,
                                     cfg.hidden_size), dtype))
    return caches


def lfm2_forward(p, embeds, caches, cfg: LFM2BackboneConfig):
    """[B, T, H] + per-layer caches -> (normed hidden, caches)."""
    x = embeds
    b, t, _ = x.shape
    heads, kv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
    new_caches = []
    for i in range(cfg.num_hidden_layers):
        lp = p["layers"][str(i)]
        h = nn.rms_norm(lp["operator_norm"], x, cfg.norm_eps)
        cache = caches[i]
        if i in cfg.attn_idxs:
            ap = lp["self_attn"]
            q = nn.linear(ap["q_proj"], h).reshape(b, t, heads, hd)
            k = nn.linear(ap["k_proj"], h).reshape(b, t, kv, hd)
            v = nn.linear(ap["v_proj"], h).reshape(b, t, kv, hd)
            q = nn.rms_norm(ap["q_layernorm"], q, cfg.norm_eps)
            k = nn.rms_norm(ap["k_layernorm"], k, cfg.norm_eps)
            q = q.transpose(0, 2, 1, 3)
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
            positions = cache.offset + jnp.arange(t)
            cos, sin = nn.rope(positions, hd, cfg.rope_theta)
            q = nn.apply_rope(q, cos, sin)
            k = nn.apply_rope(k, cos, sin)
            mask = kv_cache.attention_mask(cache, t)
            cache, k_full, v_full = kv_cache.update_cache(cache, 0, k, v)
            cache = cache._replace(offset=cache.offset + t)
            o = nn.sdpa(q, k_full, v_full, mask=mask)
            r = nn.linear(ap["out_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, t, -1))
        else:
            cp = lp["conv"]
            bg, cg, xin = jnp.split(nn.linear(cp["in_proj"], h), 3, -1)
            bx = bg * xin
            x_conv = jnp.concatenate([cache, bx], axis=1)
            cache = x_conv[:, -(cfg.conv_L_cache - 1):]
            conv_out = nn.conv1d(cp["conv"], x_conv,
                                 groups=cfg.hidden_size)
            r = nn.linear(cp["out_proj"], cg * conv_out)
        x = x + r
        h = nn.rms_norm(lp["ffn_norm"], x, cfg.norm_eps)
        fp = lp["feed_forward"]
        x = x + nn.linear(fp["w2"], nn.silu(nn.linear(fp["w1"], h))
                          * nn.linear(fp["w3"], h))
        new_caches.append(cache)
    return nn.rms_norm(p["embedding_norm"], x, cfg.norm_eps), new_caches


# ---------------------------------------------------------------------------
# Depthformer (Transformer.swift:49-228)
# ---------------------------------------------------------------------------


def depthformer_step(p, x, cache, cfg: DepthformerConfig, norm_eps=1e-5):
    """Single-token step over all blocks. x [B, 1, D]."""
    b, t, d = x.shape
    heads, kv = cfg.num_heads, cfg.num_kv_heads
    hd = d // heads
    for i in range(cfg.layers):
        bp = p["blocks"][str(i)]
        h = nn.rms_norm(bp["attn_norm"], x, norm_eps)
        ap = bp["attn"]
        q = nn.linear(ap["q_proj"], h).reshape(b, t, heads, hd)
        k = nn.linear(ap["k_proj"], h).reshape(b, t, kv, hd)
        v = nn.linear(ap["v_proj"], h).reshape(b, t, kv, hd)
        q = nn.rms_norm(ap["q_norm"], q)
        k = nn.rms_norm(ap["k_norm"], k)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        positions = cache.offset + jnp.arange(t)
        cos, sin = nn.rope(positions, hd, 10000.0)
        # interleaved even/odd rotation (applyRotaryEmb,
        # Transformer.swift:17-45)
        q = nn.apply_rope(q, cos, sin, interleaved=True)
        k = nn.apply_rope(k, cos, sin, interleaved=True)
        mask = kv_cache.attention_mask(cache, t)
        cache, k_full, v_full = kv_cache.update_cache(cache, i, k, v)
        o = nn.sdpa(q, k_full, v_full, mask=mask)
        x = x + nn.linear(ap["o_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, t, -1))
        h = nn.rms_norm(bp["ffn_norm"], x, norm_eps)
        fp = bp["ffn"]
        x = x + nn.linear(fp["w2"], nn.silu(nn.linear(fp["w1"], h))
                          * nn.linear(fp["w3"], h))
    return x, cache._replace(offset=cache.offset + t)


# ---------------------------------------------------------------------------
# Detokenizer (Detokenizer.swift)
# ---------------------------------------------------------------------------


def detokenizer_forward(p, codes, cfg: DetokenizerConfig):
    """codes [B, K, T] -> waveform [B, samples]."""
    b, k, t = codes.shape
    offsets = (jnp.arange(k) * cfg.vocab_size)[None, :, None]
    clamped = jnp.clip(codes, 0, cfg.vocab_size - 1)
    x = nn.embedding(p["emb"]["emb"], clamped + offsets).mean(axis=1)
    x = jnp.repeat(x, cfg.upsample_factor, axis=1)
    t_up = x.shape[1]

    idx = jnp.arange(t_up)
    d_idx = idx[:, None] - idx[None, :]
    valid = (d_idx >= 0) & (d_idx < cfg.sliding_window)
    mask = jnp.where(valid, 0.0, -1e9)[None, None]

    lp = p["lfm"]
    for i, layer_type in enumerate(cfg.layer_types):
        bp = lp["layers"][str(i)]
        h = nn.rms_norm(bp["operator_norm"], x, cfg.norm_eps)
        if layer_type == "conv":
            cp = bp["conv"]
            bg, cg, xin = jnp.split(nn.linear(cp["in_proj"], h), 3, -1)
            conv_out = nn.conv1d(cp["conv"], bg * xin, padding=2,
                                 groups=cfg.hidden_size)[:, :t_up]
            r = nn.linear(cp["out_proj"], cg * conv_out)
        else:
            ap = bp["self_attn"]
            heads, kv = cfg.num_attention_heads, cfg.num_key_value_heads
            hd = cfg.hidden_size // heads
            q = nn.linear(ap["q_proj"], h).reshape(b, t_up, heads,
                                                   hd).transpose(0, 2, 1, 3)
            kk = nn.linear(ap["k_proj"], h).reshape(
                b, t_up, kv, hd).transpose(0, 2, 1, 3)
            v = nn.linear(ap["v_proj"], h).reshape(
                b, t_up, kv, hd).transpose(0, 2, 1, 3)
            q = nn.rms_norm(ap["q_layernorm"], q, cfg.norm_eps)
            kk = nn.rms_norm(ap["k_layernorm"], kk, cfg.norm_eps)
            cos, sin = nn.rope(jnp.arange(t_up), hd, cfg.rope_theta)
            q = nn.apply_rope(q, cos, sin)
            kk = nn.apply_rope(kk, cos, sin)
            o = nn.sdpa(q, kk, v, mask=mask)
            r = nn.linear(ap["out_proj"],
                          o.transpose(0, 2, 1, 3).reshape(b, t_up, -1))
        x = x + r
        h = nn.rms_norm(bp["ffn_norm"], x, cfg.norm_eps)
        fp = bp["feed_forward"]
        x = x + nn.linear(fp["w2"], nn.silu(nn.linear(fp["w1"], h))
                          * nn.linear(fp["w3"], h))
    x = nn.rms_norm(lp["embedding_norm"], x, cfg.norm_eps)
    x = nn.linear(p["lin"], x)

    n_bins = cfg.n_fft // 2 + 1
    mag = jnp.exp(x[..., :n_bins])
    phase = x[..., n_bins:]
    spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
    from tpu_audio.core.dsp import irfft as _irfft
    frames = _irfft(spec, n=cfg.n_fft, axis=-1)
    window = p.get("istft_window")
    if window is None:
        n = cfg.n_fft
        window = jnp.asarray(
            0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n), jnp.float32)
    frames = frames * window[None, None]
    n_frames = frames.shape[1]
    out_len = (n_frames - 1) * cfg.hop_length + cfg.n_fft
    oidx = (np.arange(n_frames)[:, None] * cfg.hop_length
            + np.arange(cfg.n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((b, out_len)).at[:, oidx].add(frames.reshape(b, -1))
    wsum = jnp.zeros((out_len,)).at[oidx].add(
        jnp.tile(window * window, n_frames))
    sig = sig / jnp.maximum(wsum, 1e-10)
    pad = (cfg.n_fft - cfg.hop_length) // 2
    return sig[:, pad: out_len - pad]


# ---------------------------------------------------------------------------
# Sanitize (LFM2AudioModel.sanitize, LFMAudioModel.swift:563-716)
# ---------------------------------------------------------------------------


def sanitize(weights: dict) -> dict:
    import re

    out = {}
    skip = ("audio_loss_weights", "codebook_offsets", ".downsample.",
            ".upsample.", ".num_batches_tracked", "pos_enc.pe", ".freqs")
    for k, v in weights.items():
        if any(s in k for s in skip):
            continue
        if k.startswith("conformer."):
            k = "audio_encoder." + k[len("conformer."):]
            k = (k.replace(".norm_feed_forward1.", ".ff1_norm.")
                 .replace(".norm_feed_forward2.", ".ff2_norm.")
                 .replace(".norm_self_att.", ".attn_norm.")
                 .replace(".norm_conv.", ".conv_norm.")
                 .replace(".norm_out.", ".final_norm.")
                 .replace(".feed_forward1.", ".ff1.")
                 .replace(".feed_forward2.", ".ff2.")
                 .replace(".self_attn.linear_q.", ".attn.q_proj.")
                 .replace(".self_attn.linear_k.", ".attn.k_proj.")
                 .replace(".self_attn.linear_v.", ".attn.v_proj.")
                 .replace(".self_attn.linear_out.", ".attn.out_proj.")
                 .replace(".self_attn.linear_pos.", ".attn.pos_proj.")
                 .replace(".self_attn.pos_bias_u", ".attn.pos_bias_u")
                 .replace(".self_attn.pos_bias_v", ".attn.pos_bias_v")
                 .replace(".conv.batch_norm.", ".conv.norm."))
        elif k.startswith("audio_adapter.model."):
            k = k.replace("audio_adapter.model.", "audio_adapter.layers.")
        elif k.startswith("lfm."):
            k = (k.replace(".feed_forward.linear1.", ".feed_forward.w1.")
                 .replace(".feed_forward.linear2.", ".feed_forward.w2.")
                 .replace(".feed_forward.linear3.", ".feed_forward.w3."))
        elif k.startswith("depthformer.layers."):
            m = re.match(r"depthformer\.layers\.(\d+)\.(.*)", k)
            if m:
                i, rest = m.group(1), m.group(2)
                base = f"audio_head.depthformer.blocks.{i}"
                if rest == "operator.qkv_proj.weight":
                    k = f"{base}.attn.qkv_weight"
                elif rest == "operator.out_proj.weight":
                    k = f"{base}.attn.o_proj.weight"
                elif rest == "operator.bounded_attention.q_layernorm.weight":
                    k = f"{base}.attn.q_norm.weight"
                elif rest == "operator.bounded_attention.k_layernorm.weight":
                    k = f"{base}.attn.k_norm.weight"
                elif rest.startswith("operator_norm."):
                    k = f"{base}.attn_norm.{rest.split('.', 1)[1]}"
                elif rest.startswith("feed_forward."):
                    k = f"{base}.ffn.{rest.split('.', 1)[1]}"
                elif rest.startswith("ffn_norm."):
                    k = f"{base}.ffn_norm.{rest.split('.', 1)[1]}"
                else:
                    k = f"{base}.{rest}"
        out[k] = v

    # split fused depthformer qkv (q=heads*hd, k=v=kv*hd derived from shape)
    for k in [k for k in out if k.endswith(".attn.qkv_weight")]:
        v = out.pop(k)
        total = v.shape[0]
        dim = v.shape[1]
        kv_dim = (total - dim) // 2
        base = k[: -len(".qkv_weight")]
        out[base + ".q_proj.weight"] = v[:dim]
        out[base + ".k_proj.weight"] = v[dim: dim + kv_dim]
        out[base + ".v_proj.weight"] = v[dim + kv_dim:]

    # conv layouts: torch already matches ours except pointwise squeeze
    fixed = {}
    for k, v in out.items():
        if "pointwise_conv" in k and k.endswith(".weight") and v.ndim == 3:
            v = v[..., 0] if v.shape[-1] == 1 else v
        elif ("depthwise_conv" in k or k.endswith(".conv.weight")) \
                and v.ndim == 3 and v.shape[1] > v.shape[2]:
            # MLX-converted depthwise layout [O, K, 1] -> torch [O, 1, K]
            v = np.transpose(v, (0, 2, 1))
        fixed[k] = v

    # adapter: model list indices -> norm + linears (norm = 1-d weight)
    import collections

    adapter = collections.defaultdict(dict)
    for k in [k for k in fixed if k.startswith("audio_adapter.layers.")]:
        rest = k[len("audio_adapter.layers."):]
        i, suffix = rest.split(".", 1)
        adapter[int(i)][suffix] = fixed.pop(k)
    lin_idx = 0
    for i in sorted(adapter):
        entries = adapter[i]
        is_norm = entries.get("weight") is not None \
            and entries["weight"].ndim == 1
        for suffix, v in entries.items():
            if is_norm:
                fixed[f"audio_adapter.norm.{suffix}"] = v
            else:
                fixed[f"audio_adapter.linears.{lin_idx}.{suffix}"] = v
        if not is_norm:
            lin_idx += 1
    return fixed


def sanitize_detokenizer(weights: dict) -> dict:
    out = {}
    for k, v in weights.items():
        if k == "istft.window":
            out["istft_window"] = v
            continue
        if "conv.conv.weight" in k and v.ndim == 3 \
                and v.shape[1] > v.shape[2]:
            v = np.transpose(v, (0, 2, 1))
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class LFM2Audio:
    """Speech<->text chat model with interleaved / sequential generation."""

    def __init__(self, config: LFM2AudioConfig, params, tokenizer=None,
                 detok_params=None, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.detok_params = detok_params
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._encode = ajit(lambda p, mel: adapter_forward(
            p["audio_adapter"],
            conformer_forward(p["audio_encoder"], mel, config.encoder)))
        self._backbone = ajit(functools.partial(lfm2_forward,
                                                   cfg=config.lfm))
        self._frame = ajit(self._sample_frame_impl,
                              static_argnames=("temperature", "top_k"))
        self._detok = None
        if detok_params is not None:
            self._detok = ajit(functools.partial(
                detokenizer_forward, cfg=config.detokenizer))

    @classmethod
    def from_pretrained(cls, repo_or_path: str,
                        dtype=jnp.float32) -> "LFM2Audio":
        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        config = LFM2AudioConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize,
                                     dtype=dtype)
        tokenizer = None
        if (model_dir / "tokenizer.json").exists():
            from tokenizers import Tokenizer

            tokenizer = Tokenizer.from_file(str(model_dir /
                                                "tokenizer.json"))
        detok_params = None
        detok_dir = model_dir / "audio_detokenizer"
        if (detok_dir / "model.safetensors").exists():
            import json

            if (detok_dir / "config.json").exists():
                config.detokenizer = DetokenizerConfig.from_dict(
                    json.loads((detok_dir / "config.json").read_text()))
            flat = loading.load_safetensors_file(detok_dir /
                                                 "model.safetensors")
            flat = sanitize_detokenizer(flat)
            if "lfm.layers.0.feed_forward.w1.weight" in flat:
                config.detokenizer.intermediate_size = flat[
                    "lfm.layers.0.feed_forward.w1.weight"].shape[0]
            detok_params = jax.tree.map(jnp.asarray,
                                        loading.unflatten(flat))
        return cls(config, params, tokenizer, detok_params, dtype)

    # -- embedding --------------------------------------------------------------

    def embed_text(self, ids):
        return nn.embedding(self.params["lfm"]["embed_tokens"],
                            jnp.asarray(ids, jnp.int32))

    def embed_audio_frame(self, codes):
        """codes [B, K] -> summed codebook embedding [B, H]
        (AudioEmbedding, LFMAudioModel.swift:55-89)."""
        codes = jnp.asarray(codes, jnp.int32)
        k = codes.shape[1]
        offsets = (jnp.arange(k) * self.config.audio_vocab_size)[None]
        ae = self.params["audio_embedding"]
        return nn.embedding(ae["embedding"], codes + offsets).sum(axis=1)

    def encode_audio(self, audio: np.ndarray, sample_rate: int = 16000
                     ) -> jnp.ndarray:
        """waveform -> adapted audio-in embeddings [1, T', H]."""
        mel = preprocess_audio(audio, self.config.preprocessor)
        return self._encode(self.params, jnp.asarray(mel,
                                                     self.dtype)[None])

    # -- depthformer frame sampling (sampleAudioFrame,
    #    LFMAudioModel.swift:348-390) --------------------------------------------

    def _sample_frame_impl(self, params, hidden, rng, temperature=1.0,
                           top_k=4):
        cfg = self.config
        dcfg = cfg.depthformer
        b = hidden.shape[0]
        depth_in = nn.linear(params["depth_linear"], hidden).reshape(
            b, cfg.codebooks, dcfg.dim)
        cache = kv_cache.init_cache(dcfg.layers, b, dcfg.num_kv_heads,
                                    dcfg.dim // dcfg.num_heads,
                                    cfg.codebooks + 1, hidden.dtype)
        token_emb = jnp.zeros((b, dcfg.dim), hidden.dtype)
        codes = []
        for i in range(cfg.codebooks):
            cur = depth_in[:, i][:, None] + token_emb[:, None]
            out, cache = depthformer_step(
                params["audio_head"]["depthformer"], cur, cache, dcfg)
            de = params["depth_embeddings"][str(i)]
            logits = nn.linear(de["to_logits"],
                               out[:, -1]).astype(jnp.float32)
            if temperature <= 0 or top_k == 1:
                code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                from tpu_audio.core.sampling import _mask_top_k

                masked = _mask_top_k(logits / temperature, top_k)
                rng, sub = jax.random.split(rng)
                code = jax.random.categorical(sub, masked,
                                              axis=-1).astype(jnp.int32)
            codes.append(code)
            token_emb = nn.embedding(de["embedding"], code)
        return jnp.stack(codes, axis=-1), rng

    # -- generation ----------------------------------------------------------------

    def prefill(self, segments, max_len: int = 2048):
        """``segments`` is an ordered list of ("text", ids [T]),
        ("audio_embeds", [1, T, H]) or ("audio_codes", [1, T, K]) pieces —
        the modality-interleaving equivalent of the reference's
        buildInterleavedEmbeddings (LFMAudioModel.swift:262-329). Returns
        (last hidden [B, H], caches)."""
        pieces = []
        for kind, value in segments:
            if kind == "text":
                pieces.append(self.embed_text(np.atleast_2d(value)))
            elif kind == "audio_embeds":
                pieces.append(jnp.asarray(value, self.dtype))
            elif kind == "audio_codes":
                codes = np.asarray(value)
                frames = [self.embed_audio_frame(codes[:, t])[:, None]
                          for t in range(codes.shape[1])]
                pieces.append(jnp.concatenate(frames, axis=1))
            else:
                raise ValueError(f"unknown segment kind {kind!r}")
        embeds = (jnp.concatenate(pieces, axis=1) if len(pieces) > 1
                  else pieces[0]).astype(self.dtype)
        caches = lfm2_make_cache(self.config.lfm, embeds.shape[0],
                                 embeds.shape[1] + max_len, self.dtype)
        hidden, caches = self._backbone(self.params["lfm"], embeds, caches)
        return hidden[:, -1], caches

    def _step(self, emb, caches):
        hidden, caches = self._backbone(self.params["lfm"],
                                        emb.astype(self.dtype), caches)
        return hidden[:, -1], caches

    def _text_logits(self, hidden):
        return np.asarray(nn.embedding_as_linear(
            self.params["lfm"]["embed_tokens"],
            hidden).astype(jnp.float32))

    def _sample_text(self, logits, temperature, top_k, rng_state):
        if temperature <= 0:
            return int(logits.argmax(-1)[0])
        l = logits[0] / temperature
        if 0 < top_k < len(l):
            kth = np.partition(l, -top_k)[-top_k]
            l = np.where(l >= kth, l, -np.inf)
        p = np.exp(l - l.max())
        p /= p.sum()
        return int(rng_state.choice(len(p), p=p))

    def generate(self, text_tokens=None, audio=None, audio_sr: int = 16000,
                 max_new_tokens: int = 256, temperature: float = 1.0,
                 top_k: int = 50, audio_temperature: float = 1.0,
                 audio_top_k: int = 4, interleaved: bool = False,
                 seed: int = 0):
        """-> (text token ids, audio codes [K, T_frames]) — sequential mode
        switches modality on <|audio_start|>/EOS; interleaved alternates
        n_text text tokens and n_audio frames
        (LFMAudioModel.swift:394-559)."""
        segments = []
        if isinstance(text_tokens, list) and text_tokens \
                and isinstance(text_tokens[0], tuple):
            segments = text_tokens  # pre-built interleaved segments
            text_tokens = None
        else:
            if text_tokens is not None:
                segments.append(("text", text_tokens))
            if audio is not None:
                segments.append(("audio_embeds",
                                 self.encode_audio(audio, audio_sr)))
        hidden, caches = self.prefill(segments,
                                      max_len=max_new_tokens + 2)
        rng = jax.random.PRNGKey(seed)
        host_rng = np.random.default_rng(seed)
        text_out: list[int] = []
        audio_out: list[np.ndarray] = []
        modality = MODALITY_TEXT
        last_text = None
        for kind, value in reversed(segments):
            if kind == "text":
                last_text = int(np.asarray(value).reshape(-1)[-1])
                break
        if last_text == AUDIO_START_TOKEN:
            modality = MODALITY_AUDIO_OUT
        n_text = self.config.interleaved_n_text
        n_audio = self.config.interleaved_n_audio
        modality_left = n_text
        text_done = False

        for _ in range(max_new_tokens):
            if modality == MODALITY_TEXT:
                logits = self._text_logits(hidden)
                tok = self._sample_text(logits, temperature, top_k,
                                        host_rng)
                if tok == IM_END_TOKEN:
                    break
                text_out.append(tok)
                if tok == TEXT_END_TOKEN:
                    text_done = True
                if tok == AUDIO_START_TOKEN and not interleaved:
                    modality = MODALITY_AUDIO_OUT
                emb = self.embed_text(np.asarray([[tok]], np.int32))
                hidden, caches = self._step(emb, caches)
                if interleaved:
                    modality_left -= 1
                    if modality_left <= 0 or text_done:
                        modality, modality_left = MODALITY_AUDIO_OUT, n_audio
            else:
                frame, rng = self._frame(self.params, hidden, rng,
                                         temperature=audio_temperature,
                                         top_k=audio_top_k)
                frame_np = np.asarray(frame)
                is_eos = frame_np[0, 0] == AUDIO_EOS_TOKEN
                if is_eos:
                    frame_np = np.full_like(frame_np, AUDIO_EOS_TOKEN)
                audio_out.append(frame_np[0])
                emb = self.embed_audio_frame(frame_np)[:, None]
                hidden, caches = self._step(emb, caches)
                if is_eos:
                    modality = MODALITY_TEXT
                    if text_done:
                        break
                    continue
                if interleaved:
                    modality_left -= 1
                    if modality_left <= 0 and not text_done:
                        modality, modality_left = MODALITY_TEXT, n_text

        codes = (np.stack(audio_out, axis=-1) if audio_out
                 else np.zeros((self.config.codebooks, 0), np.int32))
        return text_out, codes

    def decode_audio(self, codes: np.ndarray) -> np.ndarray:
        """audio codes [K, T] -> waveform [samples] via the detokenizer."""
        if self._detok is None:
            raise RuntimeError("audio detokenizer not loaded")
        codes = np.asarray(codes, np.int32)
        # strip EOS frames
        keep = codes[0] != AUDIO_EOS_TOKEN
        codes = codes[:, keep]
        if codes.shape[1] == 0:
            return np.zeros((0,), np.float32)
        wav = self._detok(self.detok_params, jnp.asarray(codes)[None])
        return np.asarray(wav, np.float32)[0]

    # -- chat convenience (ChatState, Processor.swift:106-194) -------------------

    def build_chat(self, system: str | None, user_text: str | None = None,
                   user_audio: np.ndarray | None = None,
                   assistant_modality: str = "text"):
        """-> (text_tokens [1, T], audio_embeds or None) for prefill."""
        if self.tokenizer is None:
            raise RuntimeError("tokenizer not loaded")
        toks = [1]  # BOS
        if system is not None:
            toks += self.tokenizer.encode(
                f"<|im_start|>system\n{system}<|im_end|>\n").ids
        toks += self.tokenizer.encode("<|im_start|>user\n").ids
        audio_embeds = None
        if user_text is not None:
            toks += self.tokenizer.encode(user_text).ids
        if user_audio is not None:
            audio_embeds = self.encode_audio(user_audio)
        toks += self.tokenizer.encode("<|im_end|>\n<|im_start|>assistant\n"
                                      ).ids
        if assistant_modality == "audio":
            toks.append(AUDIO_START_TOKEN)
        segments = [("text", np.asarray([toks], np.int32))]
        if audio_embeds is not None:
            # audio belongs inside the user turn, before the assistant
            # prefix: split at the <|im_end|> boundary
            pre = toks[: len(toks) - len(self.tokenizer.encode(
                "<|im_end|>\n<|im_start|>assistant\n").ids)
                - (1 if assistant_modality == "audio" else 0)]
            post = toks[len(pre):]
            segments = [("text", np.asarray([pre], np.int32)),
                        ("audio_embeds", audio_embeds),
                        ("text", np.asarray([post], np.int32))]
        return segments
