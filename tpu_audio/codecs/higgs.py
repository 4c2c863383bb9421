"""HiggsAudio v2 tokenizer: RVQ token -> waveform decoder.

TPU-first rebuild of the reference
(Sources/MLXAudioCodecs/HiggsAudio/HiggsAudioTokenizer.swift): an
8-codebook RVQ whose per-level decode is project_out(codebook[idx]),
summed across levels, projected by fc2 into the acoustic decoder — a
snake SEANet with strides (8,5,4,2,3) whose transposed convs are
length-clamped to exactly stride*T (HiggsAudioTokenizer.swift:113-137).

Decode is the primary path (tokens come from the Higgs TTS LLM);
``encode_acoustic`` mirrors the reference's ``encodeAcoustic``
(HiggsAudioTokenizer.swift:370-374): acoustic SEANet encoder -> greedy
residual vector quantization.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.core import hub, loading, nn
from tpu_audio.core.jitting import ajit

__all__ = ["HiggsAudioTokenizer", "HiggsConfig"]


@dataclass
class HiggsConfig:
    """HiggsAudioTokenizerConfig (HiggsAudioTokenizer.swift:7-55)."""

    sample_rate: int = 24000
    codebook_size: int = 1024
    codebook_dim: int = 64
    downsample_factor: int = 320
    dac_num_codebooks: int = 8
    dac_encoder_ratios: tuple = (8, 5, 4, 2, 3)
    dac_decoder_hidden: int = 1024

    @classmethod
    def from_dict(cls, d: dict) -> "HiggsConfig":
        keys = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in d.items() if k in keys}
        if "dac_encoder_ratios" in kw:
            kw["dac_encoder_ratios"] = tuple(kw["dac_encoder_ratios"])
        return cls(**kw)


def _snake(p, x):
    a = p["alpha"].reshape(1, 1, -1)
    s = jnp.sin(a * x)
    return x + s * s / (a + 1e-9)


def _conv(p, x, kernel: int, stride: int = 1, dilation: int = 1):
    pad = (kernel - stride) * dilation // 2
    return nn.conv1d(p, x, stride=stride, padding=pad, dilation=dilation)


def _convt(p, x, kernel: int, stride: int):
    """Transposed conv clamped to exactly stride*T output samples
    (HiggsAudioTokenizer.swift:113-137)."""
    expected = x.shape[1] * stride
    pad = (kernel - stride) // 2 if kernel > stride else 0
    y = nn.conv_transpose1d(p, x, stride=stride, padding=pad)
    return y[:, :expected]


def _res_unit(p, x, dilation: int):
    y = _snake(p["snake1"], x)
    y = _conv(p["conv1"], y, 7, dilation=dilation)
    y = _snake(p["snake2"], y)
    y = _conv(p["conv2"], y, 1)
    return x + y


def encoder_forward(params, x, cfg: HiggsConfig):
    """waveform [B, T, 1] -> acoustic features [B, T', F]
    (HiggsAcousticEncoder, HiggsAudioTokenizer.swift:221-249): k7 stem,
    per-stride blocks of 3 res units + snake + strided k=2s conv with
    ceil(s/2) padding, snake + k3 head."""
    p = params["acoustic_encoder"]
    h = _conv(p["conv1"], x, 7)
    for i, stride in enumerate(cfg.dac_encoder_ratios):
        bp = p["block"][str(i)]
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(bp[f"res_unit{j + 1}"], h, dil)
        h = _snake(bp["snake1"], h)
        h = nn.conv1d(bp["conv1"], h, stride=stride,
                      padding=stride // 2 + stride % 2)
    h = _snake(p["snake1"], h)
    return _conv(p["conv2"], h, 3)


def rvq_encode(params, z, cfg: HiggsConfig):
    """features [B, T, F] -> codes [B, T, n_codebooks] by greedy residual
    quantization (HiggsResidualVectorQuantizer.encode,
    HiggsAudioTokenizer.swift:299-338); the distance term is one batched
    matmul per stage."""
    residual = z.astype(jnp.float32)
    tokens = []
    for i in range(cfg.dac_num_codebooks):
        qp = params["quantizer"]["quantizers"][str(i)]
        cb = qp["codebook"]["weight"].astype(jnp.float32)  # [K, d]
        zq = nn.linear(qp["project_in"], residual)
        dists = ((zq * zq).sum(-1, keepdims=True)
                 + (cb * cb).sum(-1)
                 - 2.0 * zq @ cb.T)
        idx = jnp.argmin(dists, axis=-1).astype(jnp.int32)
        tokens.append(idx)
        residual = residual - nn.linear(qp["project_out"], cb[idx])
    return jnp.stack(tokens, axis=-1)


def rvq_decode(params, codes, cfg: HiggsConfig):
    """codes [B, T, n_codebooks] -> latents [B, T, latent]
    (HiggsAudioTokenizer.swift:318-331)."""
    out = None
    for i in range(codes.shape[-1]):
        qp = params["quantizer"]["quantizers"][str(i)]
        emb = qp["codebook"]["weight"][codes[..., i]]
        dec = nn.linear(qp["project_out"], emb)
        out = dec if out is None else out + dec
    return out


def decoder_forward(params, z, cfg: HiggsConfig):
    """latents -> waveform [B, T*downsample, 1]
    (HiggsAudioTokenizer.swift:251-283)."""
    p = params["acoustic_decoder"]
    h = _conv(p["conv1"], z, 7)
    for i, stride in enumerate(cfg.dac_encoder_ratios):
        bp = p["block"][str(i)]
        h = _snake(bp["snake1"], h)
        h = _convt(bp["conv_t1"], h, 2 * stride, stride)
        for j, dil in enumerate((1, 3, 9)):
            h = _res_unit(bp[f"res_unit{j + 1}"], h, dil)
    h = _snake(p["snake1"], h)
    return _conv(p["conv2"], h, 7)


def sanitize(weights, prefix: str = ""):
    """HiggsAudioTokenizer.swift:407-445 — inverted for torch layouts:
    keep the acoustic decode subtrees, rename codebook.embed, drop EMA
    buffers and the semantic branch."""
    out = {}
    for k, v in weights.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        if (k == "semantic_model.masked_spec_embed"
                or k.startswith(("decoder_semantic.", "fc1.",
                                 "semantic_model.", "encoder_semantic."))):
            continue
        if k.endswith((".embed_avg", ".cluster_size", ".inited")):
            continue
        if not k.startswith(("acoustic_encoder.", "acoustic_decoder.",
                             "quantizer.", "fc2.")):
            continue
        if k.endswith(".codebook.embed"):
            k = k[: -len("embed")] + "weight"
        if k.endswith(".alpha") and v.ndim == 3:
            v = v.reshape(-1)
        out[k] = v
    return out


class HiggsAudioTokenizer:
    def __init__(self, config: HiggsConfig, params, dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self.sample_rate = config.sample_rate
        self._decode = ajit(
            lambda p, c: decoder_forward(
                p, nn.linear(p["fc2"], rvq_decode(p, c, config)), config))
        self._encode_acoustic = ajit(
            lambda p, w: rvq_encode(p, encoder_forward(p, w, config), config))

    @classmethod
    def from_pretrained(cls, repo_or_path: str, dtype=jnp.float32
                        ) -> "HiggsAudioTokenizer":
        from pathlib import Path

        model_dir = Path(hub.resolve_or_download_model(repo_or_path))
        if (model_dir / "audio_tokenizer" / "config.json").exists():
            model_dir = model_dir / "audio_tokenizer"
        config = HiggsConfig.from_dict(hub.load_config(model_dir))
        params = loading.load_params(model_dir, sanitize=sanitize, dtype=dtype)
        return cls(config, params, dtype)

    def decode(self, tokens) -> np.ndarray:
        """tokens [T, n_codebooks] or [B, T, K] -> waveform [B?, samples]
        (HiggsAudioTokenizer.swift:361-368)."""
        t = jnp.asarray(tokens, jnp.int32)
        squeeze = t.ndim == 2
        if squeeze:
            t = t[None]
        wav = self._decode(self.params, t)
        out = np.asarray(wav[..., 0])
        return out[0] if squeeze else out

    def encode_acoustic(self, waveform) -> np.ndarray:
        """waveform [T] / [B, T] / [B, T, 1] -> acoustic RVQ codes
        [B?, T', n_codebooks] (encodeAcoustic,
        HiggsAudioTokenizer.swift:370-374): acoustic encoder -> greedy
        residual quantization. Note: like the reference, this requires a
        checkpoint whose acoustic-encoder head width matches the
        quantizer's project_in latent (the fc1 semantic-fusion variant
        does not re-encode through this path)."""
        w = jnp.asarray(waveform, jnp.float32)
        squeeze = w.ndim == 1
        if squeeze:
            w = w[None]
        if w.ndim == 2:
            w = w[..., None]
        codes = np.asarray(self._encode_acoustic(self.params, w))
        return codes[0] if squeeze else codes

    def encode(self, audio) -> np.ndarray:
        """AudioCodecModel-protocol encode: delegates to the acoustic path
        (the reference's only encode surface, swift:370-374)."""
        return self.encode_acoustic(audio)
