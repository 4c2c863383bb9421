"""Fish-Speech S1 DAC: causal snake SEANet + downsampled dual RVQ with
window-limited transformers.

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/FishS1DAC/*): a causal DAC (left-padded convs
with ideal-length extra padding, right-trimmed transposed convs) whose
encoder/decoder stacks embed window-limited rope transformers at
configurable stages, and a quantizer that 4x-downsamples the latents
(causal conv + ConvNeXt stages), applies a SEMANTIC 1-codebook RVQ plus
a residual N-codebook RVQ on the remainder
(FishS1DACQuantization.swift:205-341), passes the sum through pre/post
window transformers, and upsamples back. VQ lookups L2-normalize both
latents and codebooks (FishS1DACQuantization.swift:79-97).

All convs are channels-last; the full encode and decode are each one
jitted graph.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import AudioCodecModel
from tpu_audio.codecs.snac import _fold_weight_norm
from tpu_audio.core import hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["FishS1DAC", "FishS1Config"]


@dataclass
class FishS1Config:
    """FishS1DACConfig.swift:44-74."""

    encoder_dim: int = 64
    encoder_rates: tuple = (2, 4, 8, 8)
    latent_dim: int = 1024
    decoder_dim: int = 1536
    decoder_rates: tuple = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    semantic_codebook_size: int = 4096
    downsample_factor: tuple = (2, 2)
    sample_rate: int = 44100
    causal: bool = True
    encoder_transformer_layers: tuple = (0, 0, 0, 4)
    decoder_transformer_layers: tuple = (4, 0, 0, 0)
    quantizer_transformer_layers: int = 8
    quantizer_transformer_heads: int = 16
    quantizer_transformer_dim: int = 1024
    quantizer_transformer_intermediate_size: int = 3072
    transformer_head_dim: int = 64
    quantizer_window_size: int = 128
    window_size: int = 512

    @classmethod
    def from_dict(cls, d: dict) -> "FishS1Config":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        for k in ("encoder_rates", "decoder_rates", "downsample_factor",
                  "encoder_transformer_layers", "decoder_transformer_layers"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @property
    def frame_length(self) -> int:
        return self.hop_length * int(np.prod(self.downsample_factor))


# -- conv helpers (channels-last, causal) --------------------------------------------


def _causal_conv(p, x, kernel: int, stride: int = 1, dilation: int = 1,
                 groups: int = 1):
    """Left pad (k_eff - stride) + ideal-length extra right pad
    (FishS1DACLayers.swift:294-337)."""
    k_eff = (kernel - 1) * dilation + 1
    pad_total = k_eff - stride
    length = x.shape[1]
    n_frames = (length - k_eff + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + k_eff - pad_total
    extra = max(0, ideal - length)
    x = jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)))
    return nn.conv1d(p, x, stride=stride, dilation=dilation, groups=groups)


def _causal_convt(p, x, kernel: int, stride: int):
    """Transposed conv trimmed on the right by k - stride."""
    y = nn.conv_transpose1d(p, x, stride=stride)
    trim = max(kernel - stride, 0)
    return y[:, : y.shape[1] - trim] if trim else y


def _snake(p, x):
    return nn.snake(x, p["alpha"])


def _res_unit(p, x, dilation: int):
    """snake -> k7 conv -> snake -> k1 conv, causal-trimmed skip
    (FishS1DAC.swift:9-52)."""
    b = p["block"]
    y = _snake(b["0"], x)
    y = _causal_conv(b["1"], y, 7, dilation=dilation)
    y = _snake(b["2"], y)
    y = _causal_conv(b["3"], y, 1)
    return x[:, : y.shape[1]] + y


def _convnext(p, x):
    """Causal ConvNeXt block (FishS1DACTransformer.swift:6-50)."""
    h = _causal_conv(p["dwconv"], x, 7, groups=x.shape[-1])
    h = nn.layer_norm(p["norm"], h, eps=1e-6)
    h = nn.gelu(nn.linear(p["pwconv1"], h))
    h = nn.linear(p["pwconv2"], h)
    if "gamma" in p:
        h = p["gamma"] * h
    return x + h


def _window_transformer(p, x, n_layers: int, n_heads: int, head_dim: int,
                        window: int, in_proj: bool):
    """Window-limited causal rope transformer
    (FishS1DACTransformer.swift:250-303); channels-last throughout."""
    h = nn.linear(p["input_proj"], x) if in_proj else x
    b, t, d = h.shape
    pos = np.arange(t)
    inv = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2) / head_dim))
    ang = pos[:, None] * inv[None, :]
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    row = np.arange(t)[:, None]
    col = np.arange(t)[None, :]
    visible = (col >= np.maximum(row - window + 1, 0)) & (col <= row)
    mask = jnp.asarray(np.where(visible, 0.0, -1e9), jnp.float32)[None, None]
    attn_dim = n_heads * head_dim  # may differ from the channel dim
    for i in range(n_layers):
        lp = p["layers"][str(i)]
        hn = nn.rms_norm(lp["attention_norm"], h, 1e-5)
        qkv = nn.linear(lp["attention"]["wqkv"], hn)
        q, k, v = jnp.split(qkv, [attn_dim, 2 * attn_dim], axis=-1)
        q = q.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)
        q = nn.apply_rope(q, cos, sin, interleaved=True)
        k = nn.apply_rope(k, cos, sin, interleaved=True)
        o = nn.sdpa(q, k, v, mask=mask)
        o = nn.linear(lp["attention"]["wo"],
                      o.transpose(0, 2, 1, 3).reshape(b, t, attn_dim))
        h = h + lp["attention_layer_scale"]["gamma"] * o
        hn = nn.rms_norm(lp["ffn_norm"], h, 1e-5)
        ff = nn.linear(lp["feed_forward"]["w2"],
                       nn.silu(nn.linear(lp["feed_forward"]["w1"], hn))
                       * nn.linear(lp["feed_forward"]["w3"], hn))
        h = h + lp["ffn_layer_scale"]["gamma"] * ff
    h = nn.rms_norm(p["norm"], h, 1e-5)
    if in_proj:
        h = nn.linear(p["output_proj"], h)
    return h


# -- encoder / decoder ---------------------------------------------------------------


def encoder_forward(params, x, cfg: FishS1Config):
    p = params["encoder"]["block"]
    h = _causal_conv(p["0"], x, 7)
    dim = cfg.encoder_dim
    for i, stride in enumerate(cfg.encoder_rates):
        dim *= 2
        bp = p[str(i + 1)]["block"]
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(bp[str(j)], h, dil)
        h = _snake(bp["3"], h)
        h = _causal_conv(bp["4"], h, 2 * stride, stride=stride)
        n_tf = cfg.encoder_transformer_layers[i]
        if n_tf:
            h = _window_transformer(bp["5"], h, n_tf, max(dim // 64, 1),
                                    cfg.transformer_head_dim,
                                    cfg.window_size, in_proj=False)
    last = len(cfg.encoder_rates) + 1
    h = _snake(p[str(last)], h)
    return _causal_conv(p[str(last + 1)], h, 3)


def decoder_forward(params, z, cfg: FishS1Config):
    p = params["decoder"]["model"]
    h = _causal_conv(p["0"], z, 7)
    for i, stride in enumerate(cfg.decoder_rates):
        bp = p[str(i + 1)]["block"]
        h = _snake(bp["0"], h)
        h = _causal_convt(bp["1"], h, 2 * stride, stride)
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(bp[str(j + 2)], h, dil)
    last = len(cfg.decoder_rates) + 1
    h = _snake(p[str(last)], h)
    h = _causal_conv(p[str(last + 1)], h, 7)
    return jnp.tanh(h)


# -- quantizer -----------------------------------------------------------------------


def _l2norm(x, axis=-1, eps=1e-12):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def _vq_encode(qp, residual):
    z_e = nn.conv1d(qp["in_proj"], residual)
    emb = qp["codebook"]["weight"].astype(jnp.float32)
    enc = _l2norm(z_e.astype(jnp.float32))
    code = _l2norm(emb)
    dist = (jnp.sum(enc * enc, axis=-1, keepdims=True)
            - 2.0 * enc @ code.T + jnp.sum(code * code, axis=-1)[None, None])
    idx = jnp.argmin(dist, axis=-1)
    z_q = emb[idx].astype(residual.dtype)
    return nn.conv1d(qp["out_proj"], z_q), idx.astype(jnp.int32)


def _rvq_encode(p, z, n_q: int):
    residual, z_q, codes = z, jnp.zeros_like(z), []
    for i in range(n_q):
        qi, idx = _vq_encode(p["quantizers"][str(i)], residual)
        z_q = z_q + qi
        residual = residual - qi
        codes.append(idx)
    return z_q, jnp.stack(codes, axis=1)


def _rvq_from_codes(p, codes):
    z_q = None
    for i in range(codes.shape[1]):
        qp = p["quantizers"][str(i)]
        emb = qp["codebook"]["weight"][codes[:, i]]
        proj = nn.conv1d(qp["out_proj"],
                         emb.astype(qp["out_proj"]["weight"].dtype))
        z_q = proj if z_q is None else z_q + proj
    return z_q


def _quantizer_transform(params, h, cfg: FishS1Config, key: str):
    return _window_transformer(
        params["quantizer"][key], h, cfg.quantizer_transformer_layers,
        cfg.quantizer_transformer_heads, cfg.transformer_head_dim,
        cfg.quantizer_window_size,
        in_proj=cfg.latent_dim != cfg.quantizer_transformer_dim)


def quantize(params, z, cfg: FishS1Config):
    """latents [B, T, D] -> codes [B, 1+n_codebooks, T/ds]
    (FishS1DACQuantization.swift:272-310)."""
    q = params["quantizer"]
    h = z
    for i, factor in enumerate(cfg.downsample_factor):
        dp = q["downsample"][str(i)]
        h = _causal_conv(dp["0"], h, factor, stride=factor)
        h = _convnext(dp["1"], h)
    h = _quantizer_transform(params, h, cfg, "pre_module")
    sem_z, sem_codes = _rvq_encode(q["semantic_quantizer"], h, 1)
    res_z, res_codes = _rvq_encode(q["quantizer"], h - sem_z,
                                   cfg.n_codebooks)
    return jnp.concatenate([sem_codes, res_codes], axis=1)


def dequantize(params, codes, cfg: FishS1Config):
    """codes [B, 1+n, T'] -> latents [B, T'*ds, D]
    (FishS1DACQuantization.swift:312-341)."""
    q = params["quantizer"]
    sem = _rvq_from_codes(q["semantic_quantizer"], codes[:, :1])
    if codes.shape[1] > 1:
        sem = sem + _rvq_from_codes(q["quantizer"], codes[:, 1:])
    h = _quantizer_transform(params, sem, cfg, "post_module")
    for i, factor in reversed(list(enumerate(cfg.downsample_factor))):
        up = q["upsample"][str(len(cfg.downsample_factor) - 1 - i)]
        h = _causal_convt(up["0"], h, factor, factor)
        h = _convnext(up["1"], h)
    return h


def encode_zq(params, audio, cfg: FishS1Config):
    """waveform -> continuous quantized latents z_q [B, T', latent_dim]
    (FishS1DAC.encodeZQ, FishS1DAC.swift:417-438): semantic + residual
    from_codes sums, used as the EchoTTS latent space."""
    codes = quantize(params, encoder_forward(params, audio, cfg), cfg)
    q = params["quantizer"]
    sem = _rvq_from_codes(q["semantic_quantizer"],
                          jnp.clip(codes[:, :1], 0,
                                   cfg.semantic_codebook_size - 1))
    if codes.shape[1] > 1:
        sem = sem + _rvq_from_codes(q["quantizer"],
                                    jnp.clip(codes[:, 1:], 0,
                                             cfg.codebook_size - 1))
    return sem


def decode_zq(params, z_q, cfg: FishS1Config):
    """z_q [B, T', latent_dim] -> waveform [B, T, 1]
    (FishS1DAC.decodeZQ, FishS1DAC.swift:440-451)."""
    h = _quantizer_transform(params, z_q, cfg, "post_module")
    q = params["quantizer"]
    for i, factor in reversed(list(enumerate(cfg.downsample_factor))):
        up = q["upsample"][str(len(cfg.downsample_factor) - 1 - i)]
        h = _causal_convt(up["0"], h, factor, factor)
        h = _convnext(up["1"], h)
    wav = decoder_forward(params, h, cfg)
    expected = z_q.shape[1] * cfg.frame_length
    return wav[:, :expected]


def sanitize(weights):
    """torch fish-speech checkpoints: unwrap .conv(.conv) wrappers, fold
    parametrized weight norm; torch layouts already match our convs."""
    flat = {}
    for k, v in weights.items():
        k = k.replace(".conv.parametrizations.weight.original0", ".weight_g")
        k = k.replace(".conv.parametrizations.weight.original1", ".weight_v")
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        if k.endswith(".causal_mask") or k.endswith(".freqs_cis"):
            continue
        # unwrap CausalConvNet/Conv1dTorch nesting
        k = k.replace(".conv.conv.", ".").replace(".conv.weight", ".weight")
        k = k.replace(".conv.bias", ".bias")
        flat[k] = v
    out = {}
    for k, v in flat.items():
        if k.endswith(".weight_g"):
            continue
        if k.endswith(".weight_v"):
            g = flat.get(k[:-len(".weight_v")] + ".weight_g")
            if g is None:
                continue
            k = k[:-len(".weight_v")] + ".weight"
            v = _fold_weight_norm(g, v)
        if k.endswith(".alpha") and v.ndim == 3:
            v = v.reshape(-1)
        if k.endswith(".gamma") and v.ndim > 1:
            v = v.reshape(-1)
        out[k] = v
    return out


class FishS1DAC(AudioCodecModel):
    def __init__(self, config: FishS1Config, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._encode = ajit(
            lambda p, x: quantize(p, encoder_forward(p, x, config), config))
        self._decode = ajit(
            lambda p, c: decoder_forward(p, dequantize(p, c, config),
                                         config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "FishS1DAC":
        model_dir = hub.resolve_or_download_model(repo_or_path)
        config = FishS1Config.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def encode(self, audio):
        """waveform -> codes [B, 1+n_codebooks, frames]
        (FishS1DAC.swift:382-410)."""
        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = x[None, :, None]
        elif x.ndim == 2:
            x = x[:, :, None]
        fl = self.config.frame_length
        pad = (-x.shape[1]) % fl
        if pad:
            x = np.pad(x, ((0, 0), (0, pad), (0, 0)))
        return self._encode(self.params, jnp.asarray(x, self.dtype))

    def decode(self, codes):
        """codes -> waveform [B, T, 1] (FishS1DAC.swift:412-424)."""
        codes = jnp.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        return self._decode(self.params, codes)

    def encode_zq(self, audio):
        """waveform [T] -> z_q [B, T', latent_dim] (EchoTTS latent)."""
        x = np.asarray(audio, np.float32)
        if x.ndim == 1:
            x = x[None, :, None]
        elif x.ndim == 2:
            x = x[:, :, None]
        pad = (-x.shape[1]) % self.config.frame_length
        if pad:
            x = np.pad(x, ((0, 0), (0, pad), (0, 0)))
        return encode_zq(self.params, jnp.asarray(x, self.dtype),
                         self.config)

    def decode_zq(self, z_q):
        return decode_zq(self.params, jnp.asarray(z_q, self.dtype),
                         self.config)

    def reconstruct(self, audio):
        audio = np.atleast_1d(np.asarray(audio))
        out = np.asarray(self.decode(self.encode(audio)))
        return out[:, : audio.shape[-1], 0]
